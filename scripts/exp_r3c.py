"""Round-3 session C: real-hardware parity of the v3 path + multi/general
timings.  Everything in ONE process (session setup costs up to ~16 min).

Usage: python scripts/exp_r3c.py [size_log2=27]
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("NTJOIN_TPU_TIMERS", "1")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ntjoin_tpu.constants import CODE_INVALID
import ntjoin_tpu.ops.sketch_pallas as sp
from ntjoin_tpu.ops.sketch_pallas import (
    sketch_codes_pallas, sketch_records_pallas,
)

T0 = time.monotonic()


def p(msg):
    print(f"[{time.monotonic()-T0:7.1f}s] {msg}", flush=True)


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 27
    n = 1 << lg
    k, w = 32, 1000
    rng = np.random.default_rng(42)
    codes_np = rng.integers(0, 4, size=n).astype(np.int8)

    # hardware parity of the v3 single-record path vs the native sketcher
    m = 1 << 24
    sub = codes_np[:m]
    t0 = time.monotonic()
    got = sketch_codes_pallas(sub, k, w)
    p(f"parity sketch (2^24) wall {time.monotonic()-t0:.1f} s, "
      f"{got.positions.shape[0]} minimizers")
    from ntjoin_tpu.io.native import available, sketch_codes_native

    if available():
        ref = sketch_codes_native(sub, k, w)
        same = (
            got.positions.tolist() == ref.positions.tolist()
            and got.hashes.tolist() == ref.hashes.tolist()
        )
        p(f"parity vs native: {'OK' if same else 'MISMATCH!!'}")

    # N-rich parity (general v3 path) at 2^22
    subn = codes_np[: 1 << 22].copy()
    for s in rng.integers(0, subn.size - 600, 20):
        subn[s : s + 500] = CODE_INVALID
    got = sketch_codes_pallas(subn, k, w)
    if available():
        ref = sketch_codes_native(subn, k, w)
        same = (
            got.positions.tolist() == ref.positions.tolist()
            and got.hashes.tolist() == ref.hashes.tolist()
        )
        p(f"N-rich parity vs native: {'OK' if same else 'MISMATCH!!'}")

    # multi-record fast path wall + stages
    recs = [codes_np[i : i + 2_000_000] for i in range(0, n, 2_000_000)]
    t0 = time.monotonic()
    out1 = sketch_records_pallas(recs, k, w)
    p(f"multi cold: {time.monotonic()-t0:.1f} s")
    for trial in range(3):
        sp._STAGES.clear()
        t0 = time.monotonic()
        out1 = sketch_records_pallas(recs, k, w)
        wall = time.monotonic() - t0
        p(f"multi warm: {wall:.2f} s => {n/wall/1e9:.3f} Gbp/s  stages={ {s: round(v,2) for s, v in sp._STAGES.items()} }")
    if available():
        r0 = sketch_codes_native(recs[3], k, w)
        same = (
            out1[3].positions.tolist() == r0.positions.tolist()
            and out1[3].hashes.tolist() == r0.hashes.tolist()
        )
        p(f"multi record parity: {'OK' if same else 'MISMATCH!!'}")

    # general N-rich multi
    codes_n = codes_np.copy()
    for s in rng.integers(0, n - 600, 100):
        codes_n[s : s + 500] = CODE_INVALID
    recs_n = [codes_n[i : i + 2_000_000] for i in range(0, n, 2_000_000)]
    t0 = time.monotonic()
    outg = sketch_records_pallas(recs_n, k, w)
    p(f"general cold: {time.monotonic()-t0:.1f} s")
    for trial in range(3):
        sp._STAGES.clear()
        t0 = time.monotonic()
        outg = sketch_records_pallas(recs_n, k, w)
        wall = time.monotonic() - t0
        p(f"general warm: {wall:.2f} s => {n/wall/1e9:.3f} Gbp/s  stages={ {s: round(v,2) for s, v in sp._STAGES.items()} }")
    if available():
        r5 = sketch_codes_native(recs_n[5], k, w)
        same = (
            outg[5].positions.tolist() == r5.positions.tolist()
            and outg[5].hashes.tolist() == r5.hashes.tolist()
        )
        p(f"general record parity: {'OK' if same else 'MISMATCH!!'}")
    p("DONE")


if __name__ == "__main__":
    main()
