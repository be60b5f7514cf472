"""Round-3 session M: batch-size sweep for the multi-record path.

The whole-assembly path is transfer-bound (sync 0.88 s ~= the 33.5 MB
packed upload).  Batches already pipeline (all _start_batch dispatches
before any _finish_batch sync): smaller batches should hide device
compute + fetch inside the next batch's upload.

Usage: python scripts/exp_r3m.py
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

import ntjoin_tpu.ops.sketch_pallas as sp

T0 = time.monotonic()


def p(msg):
    print(f"[{time.monotonic()-T0:7.1f}s] {msg}", flush=True)


def main():
    n = 1 << 27
    k, w = 32, 1000
    rng = np.random.default_rng(42)
    codes_np = rng.integers(0, 4, size=n).astype(np.int8)
    recs = [codes_np[i:i + 2_000_000] for i in range(0, n, 2_000_000)]

    ref = None
    for mb in (192, 64, 32, 16):
        os.environ["NTJOIN_TPU_BATCH_BASES"] = str(mb * 2**20)
        sp.sketch_records_pallas(recs, k, w)  # warm/compile
        walls = []
        for _ in range(3):
            sp._STAGES.clear()
            t0 = time.monotonic()
            out = sp.sketch_records_pallas(recs, k, w)
            walls.append(time.monotonic() - t0)
            stages = {s: round(v, 3) for s, v in dict(sp._STAGES).items()}
        dt = min(walls)
        p(f"batch={mb}MB: {dt:.2f} s => {n/dt/1e9:.3f} Gbp/s; {stages}")
        sig = [(s.positions.sum(), s.hashes.sum()) for s in out]
        if ref is None:
            ref = sig
        else:
            assert sig == ref, f"batch={mb}MB result mismatch"
    os.environ.pop("NTJOIN_TPU_BATCH_BASES", None)
    p("all batch sizes byte-consistent")
    p("DONE")


if __name__ == "__main__":
    main()
