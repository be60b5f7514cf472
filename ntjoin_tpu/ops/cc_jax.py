"""Device (JAX) connected components: min-hooking + pointer doubling.

The on-device counterpart of ``graph.mingraph._pointer_jump_cc`` (SURVEY §7
step 4: "connected components via label-propagation/pointer-jumping"),
wired into the pipeline by ``index_backend=device`` — the graph object
built by ``ops/device_index.build_graph_device`` labels its components on
device.  Labels are identical to the host paths: hooking by MINIMUM makes
every root the smallest node id of its component, and the host's dense
relabel (``np.unique``) of identical roots gives identical labels (scipy's
scan order agrees — labels ascend with smallest member id).

Each outer iteration scatter-mins edge endpoints' parents and compresses
with pointer doubling; the outer loop converges in O(log N) iterations.
Everything is fixed-shape under ``jit`` (`lax.while_loop`), edges padded
with a dead mask, nodes padded to a power-of-two bucket.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32


@partial(jax.jit, static_argnames=("n_pad",))
def _cc_kernel(src, dst, alive, n_pad: int):
    parent = jnp.arange(n_pad, dtype=_I32)
    sent = _I32(n_pad)  # dropped by mode="drop"

    def compress(p):
        return jax.lax.while_loop(
            lambda q: jnp.any(q[q] != q), lambda q: q[q], p
        )

    def body(state):
        p, _ = state
        ps, pd = p[src], p[dst]
        lo = jnp.minimum(ps, pd)
        hi = jnp.where(alive, jnp.maximum(ps, pd), sent)
        p2 = compress(p.at[hi].min(lo, mode="drop"))
        changed = jnp.any(jnp.where(alive, p2[src] != p2[dst], False))
        return p2, changed

    parent, _ = jax.lax.while_loop(
        lambda s: s[1], body, (parent, jnp.asarray(True))
    )
    return parent


def _bucket(n: int, lo: int = 256) -> int:
    size = lo
    while size < n:
        size *= 2
    return size


def connected_components_device(
    num_nodes: int, src: np.ndarray, dst: np.ndarray
) -> np.ndarray:
    """Dense component label per node, computed on device.

    Bit-identical to ``MinimizerGraph.components`` (labels ascend with the
    component's smallest node id).
    """
    if num_nodes == 0:
        return np.empty(0, dtype=np.int64)
    n_pad = _bucket(num_nodes)
    m = src.shape[0]
    m_pad = _bucket(max(m, 1))
    s = np.zeros(m_pad, np.int32)
    d = np.zeros(m_pad, np.int32)
    alive = np.zeros(m_pad, bool)
    s[:m] = src
    d[:m] = dst
    alive[:m] = True
    parent = np.asarray(
        _cc_kernel(jnp.asarray(s), jnp.asarray(d), jnp.asarray(alive), n_pad)
    )[:num_nodes]
    _, labels = np.unique(parent, return_inverse=True)
    return labels
