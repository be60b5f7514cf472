"""Per-stage device timing of the sketch pipeline (run on one live chip).

ONE process, ONE session: every measurement batches into this script per
CLAUDE.md (per-process session setup over the axon relay varies 3 s-35 min,
two TPU processes wedge each other, and block_until_ready is a no-op — all
syncs are host fetches).  Partial results print as JSON lines as stages
complete, so a hung stage still leaves earlier numbers in the log.

Usage: python scripts/kernel_prof.py [stage ...]
    stages: link fused decomp window multi general   (default: all)
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

_DEADLINE = time.monotonic() + float(os.environ.get("KP_BUDGET_S", 3000))


def left() -> float:
    return _DEADLINE - time.monotonic()


def emit(name, obj):
    print(json.dumps({name: obj}), flush=True)


def main() -> int:
    stages = sys.argv[1:] or ["link", "fused", "decomp", "multi", "general"]
    import jax

    if os.environ.get("KP_CPU"):
        # smoke-testing the harness itself: force CPU after import (the
        # axon sitecustomize force-registers the TPU backend)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ntjoin_tpu.utils.jaxcfg import enable_compile_cache

    enable_compile_cache()
    os.environ["NTJOIN_TPU_TIMERS"] = "1"

    from ntjoin_tpu.constants import CODE_INVALID
    import ntjoin_tpu.ops.sketch_pallas as sp
    from ntjoin_tpu.ops.sketch_pallas import (
        _CHUNKS, _ROW_BLOCK, _ceil_to, _sketch_fused, sketch_records_pallas,
    )

    interp = bool(os.environ.get("KP_INTERPRET"))
    emit("device", jax.devices()[0].platform)
    size = int(os.environ.get("KP_SIZE", 1 << 27))
    k, w = 32, 1000
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, size=size).astype(np.int8)

    nk = size - k + 1
    halo = w + k - 2
    L = -(-nk // _CHUNKS)
    code_rows = _ceil_to(L + halo, _ROW_BLOCK)
    buf = np.full(_CHUNKS * L + code_rows, CODE_INVALID, dtype=np.int8)
    buf[:size] = codes
    cap = max(5 * (nk // w + 1) // 2, 4096) + _CHUNKS

    def sync_scalar(x):
        return np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x)

    def pipelined(fn, sync, reps=5, trials=3):
        sync(fn())  # warm
        best = []
        for _ in range(trials):
            t0 = time.monotonic()
            outs = [fn() for _ in range(reps)]
            for o in outs:
                sync(o)
            best.append((time.monotonic() - t0) / reps)
        return sorted(best)

    if "link" in stages:
        # upload bandwidth: ship the packed 2-bit buffer (the product's
        # actual transfer) and force materialization with a sum
        nbytes = buf.shape[0] // 4
        pb = np.random.default_rng(1).integers(
            0, 256, nbytes, dtype=np.uint8
        )

        @jax.jit
        def consume(x):
            return jnp.sum(x, dtype=jnp.int32)

        sync_scalar(consume(pb[: 1 << 20]))  # warm + session setup
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            sync_scalar(consume(pb))
            ts.append(time.monotonic() - t0)
        up_mbps = nbytes / min(ts) / 1e6
        # download: fetch a results-sized array (~emissions * 16 B)
        n_res = 4 * 300_000
        dev_res = jax.device_put(np.zeros(n_res, np.int32))
        sync_scalar(dev_res)
        t0 = time.monotonic()
        np.asarray(dev_res)
        down_mbps = 4 * n_res / (time.monotonic() - t0) / 1e6
        # RTT floor
        one = jax.device_put(np.ones(1, np.int32))
        t0 = time.monotonic()
        for _ in range(5):
            np.asarray(one)
        rtt_ms = (time.monotonic() - t0) / 5 * 1e3
        emit("link", {
            "upload_mb_s": round(up_mbps, 1),
            "download_mb_s": round(down_mbps, 1),
            "rtt_ms": round(rtt_ms, 2),
            # whole-assembly ceiling: packed upload at measured rate
            "link_ceiling_gbps": round(size / ((size / 4) / (up_mbps * 1e6)) / 1e9, 3),
        })

    dev = jnp.asarray(buf)
    sync_scalar(dev[:1])

    if "fused" in stages and left() > 600:
        out = _sketch_fused(dev, size, k, w, cap, interpret=interp)
        cnt = int(out[3])
        ok = bool(out[4]) and bool(out[5]) and 0 < cnt <= cap
        emit("fused_check", {"cnt": cnt, "ok": ok})
        per_call = []
        for _ in range(5):
            t0 = time.monotonic()
            o = _sketch_fused(dev, size, k, w, cap, interpret=interp)
            int(o[3])
            per_call.append(time.monotonic() - t0)
        pipe = pipelined(
            lambda: _sketch_fused(dev, size, k, w, cap, interpret=interp),
            lambda o: int(o[3]),
        )
        emit("fused", {
            "per_call_ms": [round(t * 1e3, 1) for t in sorted(per_call)],
            "pipelined_ms": [round(t * 1e3, 1) for t in pipe],
            "gbps_pipelined": round(size / min(pipe) / 1e9, 2),
        })

    if "slope" in stages and left() > 200:
        # Slope methodology: the relay adds a large PER-CALL constant
        # (today's floor measured ~25 ms — an XLA-DCE'd no-op "took" 25 ms
        # in the membw stage), so absolutes from sync-every-call timing are
        # inflated.  Dispatch r reps back-to-back, sync ONCE on the last
        # output; compute-per-call = (T(r2) - T(r1)) / (r2 - r1) — any
        # per-session and per-call constants cancel.
        def slope_ms(fn, sync, r1=2, r2=12):
            sync(fn())  # warm/compile
            best = 1e9
            for _ in range(2):
                t0 = time.monotonic()
                out = None
                for _ in range(r1):
                    out = fn()
                sync(out)
                ta = time.monotonic() - t0
                t0 = time.monotonic()
                for _ in range(r2):
                    out = fn()
                sync(out)
                tb = time.monotonic() - t0
                best = min(best, (tb - ta) / (r2 - r1))
            return round(best * 1e3, 2)

        @jax.jit
        def nop_like(x):
            return x[0] + x[-1]

        small = jnp.asarray(np.arange(256, dtype=np.int32))
        sync_scalar(small[:1])
        emit("slope_nop_ms", slope_ms(lambda: nop_like(small), sync_scalar))

        rows = code_rows
        big = jnp.asarray(
            np.arange(rows * _CHUNKS, dtype=np.uint32).reshape(rows, _CHUNKS)
        )
        sync_scalar(big[:1, :1])
        nbytes = rows * _CHUNKS * 4

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _copy_kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...]

        rb = 256
        spec = pl.BlockSpec(
            (rb, _CHUNKS), lambda g: (g, 0), memory_space=pltpu.VMEM
        )

        @jax.jit
        def pallas_copy(x):
            y = pl.pallas_call(
                _copy_kernel,
                grid=(rows // rb,),
                in_specs=[spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((rows, _CHUNKS), jnp.uint32),
                interpret=interp,
            )(x)
            return y[0, 0] + y[-1, -1]

        ms = slope_ms(lambda: pallas_copy(big), sync_scalar)
        emit("slope_pallas_copy", {
            "ms": ms, "gb_s": round(2 * nbytes / (ms / 1e3) / 1e9, 1),
        })
        del big

        ms = slope_ms(
            lambda: _sketch_fused(
                dev, size, k, w, cap, interpret=interp, stop_after="hash"
            ),
            sync_scalar,
        )
        emit("slope_hash_ms", ms)
        ms = slope_ms(
            lambda: _sketch_fused(
                dev, size, k, w, cap, interpret=interp, stop_after="window"
            ),
            sync_scalar,
        )
        emit("slope_window_ms", ms)
        ms = slope_ms(
            lambda: _sketch_fused(dev, size, k, w, cap, interpret=interp),
            lambda o: int(o[3]),
        )
        emit("slope_fused", {
            "ms": ms, "gbps": round(size / (ms / 1e3) / 1e9, 2),
        })

        # scans-vs-assembly attribution: the non-slot window kernel runs
        # the same Van Herk scans but writes the full per-window argmin
        # instead of the emission/slot assembly — its slope bounds the
        # scan cost (plus a 536 MB ix write)
        from ntjoin_tpu.ops.sketch_pallas import (
            _MAXU as _MX, _SUB as _SB, _window_chunked,
        )

        hash_rows2 = L + w - 1
        nb2 = -(-hash_rows2 // w) + 1
        rows_p2 = nb2 * w

        @jax.jit
        def build_gm(codes_padded):
            sections = -(-(L + halo) // L)
            blocks = [
                codes_padded[s * L: (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
                for s in range(sections)
            ]
            x8 = jnp.concatenate(blocks, axis=0)[: L + halo]
            x8 = jnp.pad(
                x8, ((0, code_rows - L - halo), (0, 0)),
                constant_values=CODE_INVALID,
            )
            x8 = x8.reshape(code_rows, _SB, 128)
            x_lag = jnp.pad(
                x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)),
                constant_values=CODE_INVALID,
            )
            from ntjoin_tpu.ops.sketch_pallas import _hash_chunked

            h_lo, h_hi, _ = _hash_chunked.__wrapped__(
                x8, x_lag, k, interpret=interp
            )
            h_lo = jax.lax.slice_in_dim(h_lo, k - 1, k - 1 + hash_rows2)
            h_hi = jax.lax.slice_in_dim(h_hi, k - 1, k - 1 + hash_rows2)
            pad_rows = rows_p2 - hash_rows2
            h_lo = jnp.pad(
                h_lo, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MX
            )
            h_hi = jnp.pad(
                h_hi, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MX
            )
            return h_lo.transpose(1, 0, 2), h_hi.transpose(1, 0, 2)

        try:
            gmt_lo, gmt_hi = build_gm(dev)
            sync_scalar(gmt_lo[:1, :1, :1])
            l_arr = jnp.asarray(np.full(1, L, np.int32))

            @jax.jit
            def scan_only(a, b):
                wix = _window_chunked.__wrapped__(
                    a, b, l_arr, w, interpret=interp
                )
                return wix[0, 0, 0] + wix[-1, -1, -1]

            ms = slope_ms(lambda: scan_only(gmt_lo, gmt_hi), sync_scalar)
            emit("slope_scanonly_window_ms", ms)
            del gmt_lo, gmt_hi
        except Exception as e:  # noqa: BLE001
            emit("slope_scanonly_window_ms", f"fail {type(e).__name__}")

        # Brent-Kung scans under honest timing (the sync-floor hid any
        # effect in the earlier sweep)
        os.environ["NTJOIN_TPU_SCAN"] = "bk"
        jax.clear_caches()
        try:
            ms = slope_ms(
                lambda: _sketch_fused(
                    dev, size, k, w, cap, interpret=interp,
                    stop_after="window",
                ),
                sync_scalar,
            )
            emit("slope_window_bk_ms", ms)
            ms = slope_ms(
                lambda: _sketch_fused(dev, size, k, w, cap, interpret=interp),
                lambda o: int(o[3]),
            )
            emit("slope_fused_bk", {
                "ms": ms, "gbps": round(size / (ms / 1e3) / 1e9, 2),
            })
        except Exception as e:  # noqa: BLE001
            emit("slope_bk", f"fail {type(e).__name__}")
        finally:
            os.environ.pop("NTJOIN_TPU_SCAN", None)
            jax.clear_caches()

    if "sweep4" in stages and left() > 300:
        # FAST_SLOTS under slope timing (round-4's pick used sync-floor
        # numbers); _SUB needs a fresh process (module-level layout)
        import ntjoin_tpu.ops.sketch_pallas as _sp4

        def slope_fused4():
            def sync(o):
                return int(o[3])

            sync(_sketch_fused(dev, size, k, w, cap, interpret=interp))
            best = 1e9
            for _ in range(2):
                t0 = time.monotonic()
                o = None
                for _ in range(2):
                    o = _sketch_fused(dev, size, k, w, cap, interpret=interp)
                sync(o)
                ta = time.monotonic() - t0
                t0 = time.monotonic()
                for _ in range(12):
                    o = _sketch_fused(dev, size, k, w, cap, interpret=interp)
                sync(o)
                tb = time.monotonic() - t0
                best = min(best, (tb - ta) / 10)
            return round(best * 1e3, 2)

        for fs in (6, 8, 12):
            _sp4._FAST_SLOTS = fs
            jax.clear_caches()
            try:
                emit(f"sweep4_fastslots{fs}_ms", slope_fused4())
            except Exception as e:  # noqa: BLE001
                emit(f"sweep4_fastslots{fs}_ms", f"fail {type(e).__name__}")
            if left() < 200:
                break
        _sp4._FAST_SLOTS = 8
        jax.clear_caches()

    if "membw" in stages and left() > 200:
        # achievable HBM bandwidth on this chip: pallas block copy, XLA
        # elementwise (read+write), XLA reduce (read-only) over a
        # 536 MB u32 array — calibrates whether the sketch stages are
        # bandwidth- or issue-bound
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        rows = code_rows
        big = jnp.asarray(
            np.arange(rows * _CHUNKS, dtype=np.uint32).reshape(rows, _CHUNKS)
        )
        sync_scalar(big[:1, :1])
        nbytes = rows * _CHUNKS * 4

        def _copy_kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...]

        rb = 256
        grid = rows // rb
        spec = pl.BlockSpec(
            (rb, _CHUNKS), lambda g: (g, 0), memory_space=pltpu.VMEM
        )

        @jax.jit
        def pallas_copy(x):
            y = pl.pallas_call(
                _copy_kernel,
                grid=(grid,),
                in_specs=[spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((rows, _CHUNKS), jnp.uint32),
                interpret=interp,
            )(x)
            return y[0, 0] + y[-1, -1]

        @jax.jit
        def xla_elem(x):
            y = x ^ jnp.uint32(1)
            return y[0, 0] + y[-1, -1]

        @jax.jit
        def xla_reduce(x):
            return jnp.sum(x, dtype=jnp.uint32)

        for name, fn, traffic in (
            ("pallas_copy", pallas_copy, 2 * nbytes),
            ("xla_elem", xla_elem, 2 * nbytes),
            ("xla_reduce", xla_reduce, nbytes),
        ):
            try:
                t = pipelined(lambda fn=fn: fn(big), sync_scalar)
                emit(f"membw_{name}", {
                    "ms": [round(x * 1e3, 2) for x in t],
                    "gb_s": round(traffic / min(t) / 1e9, 1),
                })
            except Exception as e:  # noqa: BLE001
                emit(f"membw_{name}", f"fail {type(e).__name__}")
        del big

    if "ablate" in stages and left() > 200:
        # IN-CONTEXT stage marginals: the real fused program truncated after
        # each stage via the stop_after hook (isolated-stage timings proved
        # non-additive in round 4; these deltas are the honest attribution)
        t_hash = pipelined(
            lambda: _sketch_fused(
                dev, size, k, w, cap, interpret=interp, stop_after="hash"
            ),
            sync_scalar,
        )
        emit("ablate_through_hash_ms", [round(x * 1e3, 1) for x in t_hash])
        t_win = pipelined(
            lambda: _sketch_fused(
                dev, size, k, w, cap, interpret=interp, stop_after="window"
            ),
            sync_scalar,
        )
        emit("ablate_through_window_ms", [round(x * 1e3, 1) for x in t_win])
        t_full = pipelined(
            lambda: _sketch_fused(dev, size, k, w, cap, interpret=interp),
            lambda o: int(o[3]),
        )
        emit("ablate_full_ms", [round(x * 1e3, 1) for x in t_full])
        emit("ablate_marginals_ms", {
            "layout_hash": round(min(t_hash) * 1e3, 1),
            "window_slots": round((min(t_win) - min(t_hash)) * 1e3, 1),
            "compact": round((min(t_full) - min(t_win)) * 1e3, 1),
            "full": round(min(t_full) * 1e3, 1),
        })

    if "ablate2" in stages and left() > 200:
        # transpose attribution: same fused program but fed codes already
        # in the chunked (code_rows, SUB, LANE) layout (host-transposed,
        # uploaded once outside the timed region)
        from ntjoin_tpu.ops.sketch_pallas import _SUB as _SUBV, _LANE as _LANEV

        # device layout is uniformly x8[r, c] = flat[c*L + r] for
        # r < L + halo (invalid-padded above): build it host-side exactly.
        # NB the slots path sizes code_rows up to whole w-blocks + flush.
        cr_slots = _ceil_to(
            max(L + halo, (-(-(L + halo) // w) + 1) * w), _ROW_BLOCK
        )
        x8_np = np.full((cr_slots, _CHUNKS), CODE_INVALID, np.int8)
        lh = min(L + halo, cr_slots)
        view = np.lib.stride_tricks.as_strided(
            buf, shape=(_CHUNKS, lh), strides=(L, 1)
        )
        x8_np[:lh] = view.T
        x8dev = jnp.asarray(x8_np.reshape(cr_slots, _SUBV, _LANEV))
        sync_scalar(x8dev[:1, :1, :1])
        t_h = pipelined(
            lambda: _sketch_fused(
                x8dev, size, k, w, cap, interpret=interp,
                pre_layout=True, stop_after="hash",
            ),
            sync_scalar,
        )
        emit("ablate2_prelayout_hash_ms", [round(x * 1e3, 1) for x in t_h])
        out = _sketch_fused(
            x8dev, size, k, w, cap, interpret=interp, pre_layout=True
        )
        emit("ablate2_prelayout_check_cnt", int(out[3]))
        t_f = pipelined(
            lambda: _sketch_fused(
                x8dev, size, k, w, cap, interpret=interp, pre_layout=True
            ),
            lambda o: int(o[3]),
        )
        emit("ablate2_prelayout_full_ms", [round(x * 1e3, 1) for x in t_f])

    if "sweep2" in stages and left() > 600:
        # round-5 variant sweep: Brent-Kung scans x scan-tile size on the
        # full fused program, plus hash-kernel unroll on the hash ablation
        import ntjoin_tpu.ops.sketch_pallas as _sp

        def fused_best(reps=5, stop_after=None):
            kw = {"stop_after": stop_after} if stop_after else {}
            sync = sync_scalar if stop_after else (lambda o: int(o[3]))
            out = _sketch_fused(dev, size, k, w, cap, interpret=interp, **kw)
            sync(out)
            best = []
            for _ in range(2):
                t0 = time.monotonic()
                outs = [
                    _sketch_fused(dev, size, k, w, cap, interpret=interp, **kw)
                    for _ in range(reps)
                ]
                for o in outs:
                    sync(o)
                best.append((time.monotonic() - t0) / reps)
            return round(min(best) * 1e3, 1)

        for scan in ("v3", "bk"):
            for tr_v in (40, 200, 1000):
                os.environ["NTJOIN_TPU_SCAN"] = scan
                os.environ["NTJOIN_TPU_TR"] = str(tr_v)
                jax.clear_caches()
                try:
                    emit(f"sweep2_{scan}_tr{tr_v}_ms", fused_best())
                except Exception as e:  # noqa: BLE001
                    emit(f"sweep2_{scan}_tr{tr_v}_ms", f"fail {type(e).__name__}")
                if left() < 400:
                    break
        os.environ.pop("NTJOIN_TPU_SCAN", None)
        os.environ.pop("NTJOIN_TPU_TR", None)
        for ur in (4, 8, 16):
            os.environ["NTJOIN_TPU_UNROLL"] = str(ur)
            # module-level constant: reload path reads env at import; patch
            _sp._UNROLL = ur
            jax.clear_caches()
            try:
                emit(f"sweep2_unroll{ur}_hash_ms", fused_best(stop_after="hash"))
            except Exception as e:  # noqa: BLE001
                emit(f"sweep2_unroll{ur}_hash_ms", f"fail {type(e).__name__}")
            if left() < 300:
                break
        os.environ.pop("NTJOIN_TPU_UNROLL", None)
        _sp._UNROLL = 8
        jax.clear_caches()

    if "sweep3" in stages and left() > 300:
        # hash-kernel scheduling sweep: small unrolls (register pressure)
        # on the pre-layout hash ablation, then the full fused wall at the
        # best value
        import ntjoin_tpu.ops.sketch_pallas as _sp3

        best_ur, best_ms = 8, 1e9
        for ur in (1, 2, 4, 8):
            _sp3._UNROLL = ur
            jax.clear_caches()
            try:
                out = _sketch_fused(
                    dev, size, k, w, cap, interpret=interp, stop_after="hash"
                )
                sync_scalar(out)
                ts = []
                for _ in range(2):
                    t0 = time.monotonic()
                    outs = [
                        _sketch_fused(
                            dev, size, k, w, cap, interpret=interp,
                            stop_after="hash",
                        )
                        for _ in range(5)
                    ]
                    for o in outs:
                        sync_scalar(o)
                    ts.append((time.monotonic() - t0) / 5)
                ms = round(min(ts) * 1e3, 1)
                emit(f"sweep3_unroll{ur}_hash_ms", ms)
                if ms < best_ms:
                    best_ur, best_ms = ur, ms
            except Exception as e:  # noqa: BLE001
                emit(f"sweep3_unroll{ur}_hash_ms", f"fail {type(e).__name__}")
            if left() < 300:
                break
        _sp3._UNROLL = best_ur
        jax.clear_caches()
        out = _sketch_fused(dev, size, k, w, cap, interpret=interp)
        cnt = int(out[3])
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            outs = [
                _sketch_fused(dev, size, k, w, cap, interpret=interp)
                for _ in range(5)
            ]
            for o in outs:
                int(o[3])
            ts.append((time.monotonic() - t0) / 5)
        emit("sweep3_best", {
            "unroll": best_ur, "cnt": cnt,
            "fused_pipelined_ms": round(min(ts) * 1e3, 1),
            "gbps": round(size / min(ts) / 1e9, 2),
        })
        _sp3._UNROLL = 8
        jax.clear_caches()

    if "decomp" in stages and left() > 600:
        # stage decomposition, each under ONE jit with a sum consumer (a
        # bare count return lets XLA DCE whole stages — CLAUDE.md)
        from ntjoin_tpu.ops.sketch_pallas import (
            _MAXU, _SUB, _LANE, _hash_chunked, _window_emit_chunked,
            _compact_slots, _I32, _U32,
        )

        hash_rows = L + w - 1
        nb = -(-hash_rows // w) + 1
        rows_p = nb * w
        nw = nk - w + 1

        @jax.jit
        def stage_layout_hash(codes_padded):
            sections = -(-(L + halo) // L)
            blocks = [
                codes_padded[s * L: (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
                for s in range(sections)
            ]
            x8 = jnp.concatenate(blocks, axis=0)[: L + halo]
            x8 = jnp.pad(
                x8, ((0, code_rows - L - halo), (0, 0)),
                constant_values=CODE_INVALID,
            )
            x8 = x8.reshape(code_rows, _SUB, _LANE)
            x_lag = jnp.pad(
                x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)),
                constant_values=CODE_INVALID,
            )
            h_lo, h_hi, val = _hash_chunked.__wrapped__(x8, x_lag, k, interpret=interp)
            return jnp.sum(h_lo, dtype=jnp.uint32) ^ jnp.sum(
                h_hi, dtype=jnp.uint32
            ) ^ jnp.sum(val, dtype=jnp.int8).astype(jnp.uint32)

        t = pipelined(lambda: stage_layout_hash(dev), sync_scalar)
        emit("stage_layout_hash_ms", [round(x * 1e3, 1) for x in t])

        # layout alone (the int8 chunk transposes) vs hash alone
        @jax.jit
        def stage_layout_only(codes_padded):
            sections = -(-(L + halo) // L)
            blocks = [
                codes_padded[s * L: (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
                for s in range(sections)
            ]
            x8 = jnp.concatenate(blocks, axis=0)[: L + halo]
            x8 = jnp.pad(
                x8, ((0, code_rows - L - halo), (0, 0)),
                constant_values=CODE_INVALID,
            )
            x8 = x8.reshape(code_rows, _SUB, _LANE)
            x_lag = jnp.pad(
                x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)),
                constant_values=CODE_INVALID,
            )
            return (
                jnp.sum(x8, dtype=jnp.int32) + jnp.sum(x_lag, dtype=jnp.int32)
            )

        t = pipelined(lambda: stage_layout_only(dev), sync_scalar)
        emit("stage_layout_only_ms", [round(x * 1e3, 1) for x in t])

        @jax.jit
        def build_x8(codes_padded):
            sections = -(-(L + halo) // L)
            blocks = [
                codes_padded[s * L: (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
                for s in range(sections)
            ]
            x8 = jnp.concatenate(blocks, axis=0)[: L + halo]
            x8 = jnp.pad(
                x8, ((0, code_rows - L - halo), (0, 0)),
                constant_values=CODE_INVALID,
            )
            x8 = x8.reshape(code_rows, _SUB, _LANE)
            x_lag = jnp.pad(
                x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)),
                constant_values=CODE_INVALID,
            )
            return x8, x_lag

        x8_s, x_lag_s = build_x8(dev)
        sync_scalar(x8_s[:1, :1, :1])

        @jax.jit
        def stage_hash_only(x8, x_lag):
            h_lo, h_hi, val = _hash_chunked.__wrapped__(
                x8, x_lag, k, interpret=interp
            )
            return jnp.sum(h_lo, dtype=jnp.uint32) ^ jnp.sum(
                h_hi, dtype=jnp.uint32
            ) ^ jnp.sum(val, dtype=jnp.int8).astype(jnp.uint32)

        t = pipelined(lambda: stage_hash_only(x8_s, x_lag_s), sync_scalar)
        emit("stage_hash_only_ms", [round(x * 1e3, 1) for x in t])

        # variant: pre-widened i32 codes (trades 4x HBM code traffic for
        # no in-kernel int8->i32 vreg unpacking)
        @jax.jit
        def stage_hash_i32(x8, x_lag):
            h_lo, h_hi, val = _hash_chunked.__wrapped__(
                x8.astype(jnp.int32), x_lag.astype(jnp.int32), k,
                interpret=interp,
            )
            return jnp.sum(h_lo, dtype=jnp.uint32) ^ jnp.sum(
                h_hi, dtype=jnp.uint32
            ) ^ jnp.sum(val, dtype=jnp.int8).astype(jnp.uint32)

        t = pipelined(lambda: stage_hash_i32(x8_s, x_lag_s), sync_scalar)
        emit("stage_hash_i32_ms", [round(x * 1e3, 1) for x in t])

        # staged window inputs (pad + reshape, built once on device)
        @jax.jit
        def build_window_inputs(codes_padded):
            sections = -(-(L + halo) // L)
            blocks = [
                codes_padded[s * L: (s + _CHUNKS) * L].reshape(_CHUNKS, L).T
                for s in range(sections)
            ]
            x8 = jnp.concatenate(blocks, axis=0)[: L + halo]
            x8 = jnp.pad(
                x8, ((0, code_rows - L - halo), (0, 0)),
                constant_values=CODE_INVALID,
            )
            x8 = x8.reshape(code_rows, _SUB, _LANE)
            x_lag = jnp.pad(
                x8[: code_rows - k], ((k, 0), (0, 0), (0, 0)),
                constant_values=CODE_INVALID,
            )
            h_lo, h_hi, val = _hash_chunked.__wrapped__(x8, x_lag, k, interpret=interp)
            h_lo = jax.lax.slice_in_dim(h_lo, k - 1, k - 1 + hash_rows)
            h_hi = jax.lax.slice_in_dim(h_hi, k - 1, k - 1 + hash_rows)
            pad_rows = rows_p - hash_rows
            h_lo = jnp.pad(
                h_lo, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU
            )
            h_hi = jnp.pad(
                h_hi, ((0, pad_rows), (0, 0), (0, 0)), constant_values=_MAXU
            )
            return (
                h_lo.reshape(rows_p, _CHUNKS), h_hi.reshape(rows_p, _CHUNKS)
            )

        gm_lo, gm_hi = build_window_inputs(dev)
        sync_scalar(gm_lo[:1, :1])
        scal = np.array([L, nw], np.int32)

        for runs_flag in (True, False):
            @jax.jit
            def stage_window(lo, hi, rf=runs_flag):
                oix, olo, ohi, orun = _window_emit_chunked.__wrapped__(
                    lo, hi, jnp.asarray(scal), w, runs=rf, interpret=interp
                )
                return (
                    jnp.sum(oix) + jnp.sum(olo) + jnp.sum(ohi) + jnp.sum(orun)
                )

            t = pipelined(lambda: stage_window(gm_lo, gm_hi), sync_scalar)
            emit(
                f"stage_window_runs{int(runs_flag)}_ms",
                [round(x * 1e3, 1) for x in t],
            )

        @jax.jit
        def stage_window_compact(lo, hi):
            oix, olo, ohi, orun = _window_emit_chunked.__wrapped__(
                lo, hi, jnp.asarray(scal), w, runs=True, interpret=interp
            )
            pos, o_lo, o_hi, o_run, count, slots_ok = _compact_slots(
                oix, olo, ohi, orun, cap
            )
            return (
                jnp.sum(pos) + jnp.sum(o_lo).astype(jnp.int32)
                + count + slots_ok.astype(jnp.int32)
            )

        t = pipelined(lambda: stage_window_compact(gm_lo, gm_hi), sync_scalar)
        emit("stage_window_compact_ms", [round(x * 1e3, 1) for x in t])

        # repeat-dense variant: dense tier + propagate scan actually firing
        codes_rep = codes.copy()
        for s0 in range(0, size, size // 64):
            codes_rep[s0: s0 + 4000] = 1  # poly-C blocks
        buf_rep = np.full(_CHUNKS * L + code_rows, CODE_INVALID, np.int8)
        buf_rep[:size] = codes_rep
        dev_rep = jnp.asarray(buf_rep)
        gm_lo_r, gm_hi_r = build_window_inputs(dev_rep)
        sync_scalar(gm_lo_r[:1, :1])
        t = pipelined(lambda: stage_window(gm_lo_r, gm_hi_r), sync_scalar)
        emit("stage_window_repeatdense_ms", [round(x * 1e3, 1) for x in t])

    if "sweep" in stages and left() > 600:
        # kernel-parameter sweep on the full fused pipeline (each variant
        # retraces + recompiles once; jax caches cleared between points)
        def fused_time():
            out = _sketch_fused(dev, size, k, w, cap, interpret=interp)
            int(out[3])
            best = []
            for _ in range(2):
                t0 = time.monotonic()
                outs = [
                    _sketch_fused(dev, size, k, w, cap, interpret=interp)
                    for _ in range(5)
                ]
                for o in outs:
                    int(o[3])
                best.append((time.monotonic() - t0) / 5)
            return round(min(best) * 1e3, 1)

        for tr_v in (8, 40, 200, 1000):
            os.environ["NTJOIN_TPU_TR"] = str(tr_v)
            jax.clear_caches()
            try:
                emit(f"sweep_tr{tr_v}_ms", fused_time())
            except Exception as e:  # noqa: BLE001
                emit(f"sweep_tr{tr_v}_ms", f"fail {type(e).__name__}")
        os.environ.pop("NTJOIN_TPU_TR", None)
        for fs in (8, 16):
            sp._FAST_SLOTS = fs
            jax.clear_caches()
            try:
                emit(f"sweep_fastslots{fs}_ms", fused_time())
            except Exception as e:  # noqa: BLE001
                emit(f"sweep_fastslots{fs}_ms", f"fail {type(e).__name__}")
        sp._FAST_SLOTS = 12
        jax.clear_caches()

    def trials(fn, n=3):
        fn()  # warm
        walls, st = [], []
        for _ in range(n):
            sp._STAGES.clear()
            t0 = time.monotonic()
            fn()
            walls.append(time.monotonic() - t0)
            st.append(dict(sp._STAGES))
        best = min(range(n), key=lambda i: walls[i])
        return sorted(walls), st[best]

    if "multi" in stages and left() > 400:
        recs = [codes[i: i + 2_000_000] for i in range(0, size, 2_000_000)]
        multi, multi_stages = trials(
            lambda: sketch_records_pallas(recs, k, w, interpret=interp)
        )
        emit("multi", {
            "wall_s": [round(x, 3) for x in multi],
            "gbps": round(size / min(multi) / 1e9, 4),
            "stages_s": {s: round(v, 3) for s, v in multi_stages.items()},
        })

    if "general" in stages and left() > 400:
        codes_n = codes.copy()
        for s0 in rng.integers(0, size - 600, 100):
            codes_n[s0: s0 + 500] = CODE_INVALID
        recs_n = [
            codes_n[i: i + 2_000_000] for i in range(0, size, 2_000_000)
        ]
        general, general_stages = trials(
            lambda: sketch_records_pallas(recs_n, k, w, interpret=interp)
        )
        emit("general", {
            "wall_s": [round(x, 3) for x in general],
            "gbps": round(size / min(general) / 1e9, 4),
            "stages_s": {s: round(v, 3) for s, v in general_stages.items()},
        })

    emit("done", True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
