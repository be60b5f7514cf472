"""Round-3 session L: locate the slot overflow on the repeat-rich record.

Builds the same 2^22 record as exp_r3k, runs the v3 window kernel alone,
fetches the per-(lane, block) fresh counts, and dumps the slot words of
the densest blocks plus the oracle emission stream around them.

Usage: python scripts/exp_r3l.py
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ntjoin_tpu.constants import CODE_INVALID
from ntjoin_tpu.ops.sketch_pallas import (
    _CHUNKS, _I32, _LANE, _MAXU, _NSLOT, _ROW_BLOCK, _SUB, _ceil_to,
    _hash_chunked, _window_emit_chunked,
)

T0 = time.monotonic()


def p(msg):
    print(f"[{time.monotonic()-T0:7.1f}s] {msg}", flush=True)


def main():
    k, w = 32, 1000
    rng = np.random.default_rng(42)
    rep = rng.integers(0, 4, size=1 << 22).astype(np.int8)
    rep[100_000:100_200] = 0
    rep[2_000_000:2_001_500] = 2
    rep[3_000_000:3_000_100:2] = 0
    rep[3_000_001:3_000_101:2] = 3

    n = rep.shape[0]
    nk = n - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    hash_rows = L + w - 1
    nb = -(-hash_rows // w) + 1
    rows_p = nb * w
    nw = nk - w + 1
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:n] = rep

    @jax.jit
    def window_out(cp):
        sections = -(-(L + halo) // L)
        blocks = [
            cp[s * L : (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
            for s in range(sections)
        ]
        x8 = jnp.concatenate(blocks, axis=0)[: L + halo]
        x8 = jnp.pad(x8, ((0, code_rows - L - halo), (0, 0)),
                     constant_values=CODE_INVALID)
        x8 = x8.reshape(code_rows, _SUB, _LANE)
        x_lag = jnp.pad(
            x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)),
            constant_values=CODE_INVALID,
        )
        h_lo, h_hi, val = _hash_chunked.__wrapped__(x8, x_lag, k)
        a = jax.lax.slice_in_dim(h_lo, k - 1, k - 1 + hash_rows)
        b = jax.lax.slice_in_dim(h_hi, k - 1, k - 1 + hash_rows)
        pad_rows = rows_p - hash_rows
        a = jnp.pad(a, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU)
        b = jnp.pad(b, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU)
        scal = jnp.stack([jnp.asarray(L, _I32), jnp.asarray(nw, _I32)])
        return _window_emit_chunked.__wrapped__(
            a.transpose(1, 0, 2), b.transpose(1, 0, 2), scal, w
        )

    dev = jax.device_put(buf)
    oix, olo, ohi, orun = window_out(dev)
    counts = np.asarray(oix[:, :, _NSLOT, :])  # (8, nbm1, 128) fresh counts
    p(f"counts shape {counts.shape} max {counts.max()} "
      f"(slot bound {_NSLOT})")
    over = np.argwhere(counts > _NSLOT)
    p(f"blocks over bound: {len(over)}")
    oix_np = np.asarray(oix)
    orun_np = np.asarray(orun)
    for g, blk, lane in over[:4]:
        chunk = g * _LANE + lane
        p(f"g={g} blk={blk} lane={lane} chunk={chunk} "
          f"count={counts[g, blk, lane]}")
        p(f"  slot ix:  {oix_np[g, blk, :, lane].tolist()}")
        p(f"  slot run: {orun_np[g, blk, :, lane].tolist()}")
        # genomic positions of the block's windows
        w0 = chunk * L + blk * w
        p(f"  window-start range [{w0}, {w0 + w})  (runs at 100000, "
          f"2000000, 3000000)")
    # oracle: emission stream around the densest block
    if len(over):
        g, blk, lane = over[0]
        chunk = g * _LANE + lane
        from ntjoin_tpu.ops.nthash_np import sketch_codes

        lo_pos = chunk * L + blk * w
        seg = rep[max(0, lo_pos - 2 * w) : lo_pos + 3 * w]
        sk = sketch_codes(seg, k, w)
        p(f"  oracle emissions in that span: {sk.positions.shape[0]}")
        p(f"  first 40 oracle positions(+{max(0, lo_pos - 2 * w)}): "
          f"{sk.positions[:40].tolist()}")
    p("DONE")


if __name__ == "__main__":
    main()
