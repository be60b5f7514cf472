"""Multi-host initialisation and the cross-host filter exchange.

The reference has no distribution at all (SURVEY §2.2); at pod scale the
framework runs one process per host with ``jax.distributed`` and a global
mesh spanning every host's devices.  Shardings keep reference sketches
replicated and target tiles data-parallel; the global uniqueness /
intersection verdicts ride all-gathers over ICI within a slice and DCN
across hosts (see ``parallel/mesh.py`` for the single-process collectives).

Multi-process operation is testable without a pod: each process forces the
CPU backend and a virtual device count, and the coordinator runs on
localhost (``tests/test_distributed.py``).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_device_count: int | None = None,
) -> None:
    """Join the distributed runtime.  Call once, before any jax use."""
    if local_device_count is not None:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={local_device_count}"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "shard") -> Mesh:
    """1-D mesh over every device of every participating process."""
    return Mesh(np.array(jax.devices()), axis_names=(axis_name,))


def distributed_survive(mesh: Mesh, lo, hi, asm, alive, n_asm: int):
    """Global uniqueness+intersection verdict across all shards.

    The SURVEY §5 collective replacing nothing in the reference (which has
    no distribution): every shard all-gathers the (hash, assembly) streams,
    derives the *identical* verdict — a hash survives iff it occurs exactly
    once in every assembly's global multiset (reference semantics of
    ``read_minimizers`` + ``filter_minimizers``,
    ``bin/ntjoin_utils.py:152-193``) — and returns the FULL verdict,
    replicated, in (device, slot) order matching the gathered layout.
    Inputs are (n_devices, L) arrays sharded on the mesh axis.
    Determinism across shardings: the verdict is a pure function of the
    gathered multiset, so every shard (and every mesh size) agrees
    bit-for-bit.
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ntjoin_tpu.ops.device_index import survive_verdict_sorted

    def step(lo, hi, asm, alive):
        g_lo = jax.lax.all_gather(lo, "shard", tiled=True).reshape(-1)
        g_hi = jax.lax.all_gather(hi, "shard", tiled=True).reshape(-1)
        g_asm = jax.lax.all_gather(asm, "shard", tiled=True).reshape(-1)
        g_alive = jax.lax.all_gather(alive, "shard", tiled=True).reshape(-1)
        order, survive_sorted = survive_verdict_sorted(
            g_lo, g_hi, g_asm, ~g_alive, n_asm
        )
        return jnp.zeros(g_lo.shape[0], bool).at[order].set(survive_sorted)

    smap = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P("shard", None),) * 4,
        out_specs=P(None),
        check_vma=False,
    )
    return jax.jit(smap)(lo, hi, asm, alive)


def gather_counts(mesh: Mesh, local_count: int) -> int:
    """Total minimizer count across all shards (smoke collective)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    local = jnp.full(1, local_count, jnp.int32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("shard")),
        np.full(
            len([d for d in jax.local_devices()]), local_count, dtype=np.int32
        ),
        (n,),
    )

    @jax.jit
    def total(x):
        return x.sum()

    return int(total(arr))
