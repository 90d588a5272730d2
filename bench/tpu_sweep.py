#!/usr/bin/env python
"""Parameterized engine sweep — the one probe script (VERDICT r1 item 8).

Replaces the 14 one-off bench/tpu_* probes from round 1 (git history has
them).  Measures {Msps, SNR dB} per (op, engine, precision) on the
current backend, all timing loops on-device via lax.scan.

    python bench/tpu_sweep.py --suite chain          # headline engines
    python bench/tpu_sweep.py --suite iir            # sosfilt engine matrix
    python bench/tpu_sweep.py --suite fir            # FIR engines
    python bench/tpu_sweep.py --suite all [--cpu]

Prints one JSON line per measurement; stderr gets progress.  One process
only — the chip is exclusive and each process pays the one-time ~400 s
first-D2H tunnel stall.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

t0 = time.time()


def log(msg):
    print(f"[{time.time()-t0:6.1f}] {msg}", file=sys.stderr, flush=True)


def snr_db(ref, y):
    ref = np.asarray(ref)
    y = np.asarray(y)
    e = np.abs(ref - y)
    return float(10 * np.log10(np.sum(np.abs(ref) ** 2) / np.sum(e**2)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="all",
                   help="comma-separated subset of "
                        "{all,chain,fir,iir,fir1ch,fusedsweep,fft,"
                        "fftsize}")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--block", type=int, default=245760)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--fft-sizes", default="256,512,1024,2048,4096,8192",
                   help="sizes for --suite fftsize")
    p.add_argument("--write-calib", action="store_true",
                   help="write the iir-suite measurements to "
                        "llzlab_tpu/calib/<device_kind>.json (the "
                        "ops/iir_select.py selection artifact)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import scipy.signal as ss
    from jax import lax

    import llzlab_tpu as lz
    from llzlab_tpu.ops import fir as fir_mod

    log(f"backend={jax.default_backend()} dev={jax.devices()[0].device_kind}")

    suites = set(args.suite.split(","))

    def want(name):
        return "all" in suites or name in suites

    C, T, ITERS = args.channels, args.block, args.iters
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((C, T)).astype(np.float32)
    x = jnp.asarray(x_np)

    def _probe(out):
        # full-output ABS sum, scaled to underflow when fed back:
        # anti-DCE AND nonlinear — a plain sum is algebraically
        # collapsible through linear XLA engines (sum∘matmul → matmul
        # of column sums; observed r4: 1.3e8 Msps on a dense-DFT row)
        s = jnp.sum(jnp.abs(jnp.real(out)))
        if jnp.iscomplexobj(out):
            s = s + jnp.sum(jnp.abs(jnp.imag(out)))
        return (s * 1e-30).astype(jnp.float32)

    # The dev-box tunnel costs a FIXED ~25 ms per jitted call regardless
    # of scan length (measured r4: n=10..640 all walls ≈25-27 ms for an
    # empty scan).  Subtract it everywhere so every suite reports net
    # device time (fusedopt pioneered this in r3; now global).
    @jax.jit
    def _empty_scan(v):
        def body(c, _):
            return c * 1.0000001 + v[0, 0], ()
        c, _ = lax.scan(body, jnp.float32(0), None, length=8)
        return c

    _zb = jnp.zeros((8, 128), jnp.float32)
    _empty_scan(_zb).block_until_ready()
    _base = 1e9
    for _ in range(3):
        t1 = time.perf_counter()
        np.asarray(_empty_scan(_zb))
        _base = min(_base, time.perf_counter() - t1)
    log(f"fixed dispatch base: {_base*1e3:.2f} ms/call (subtracted)")

    def timeit(fn, *fargs):
        # Anti-DCE/LICM: perturb the first arg with the carried
        # full-output probe — a real cross-iteration dependence, so XLA
        # can neither slice away unconsumed output nor hoist the
        # loop-invariant body (the old [0, -1] probe allowed both for
        # pure-XLA engines; Pallas calls were immune, skewing ranks).
        @jax.jit
        def go(*a):
            def body(c, _):
                return _probe(fn(a[0] + c, *a[1:])), ()
            c, _ = lax.scan(body, jnp.float32(0), None, length=ITERS)
            return c

        r = go(*fargs); r.block_until_ready()
        t1 = time.perf_counter()
        r = go(*fargs); r.block_until_ready()
        wallt = time.perf_counter() - t1
        # floor at 5% of wall: when wall ~= base the subtraction is
        # noise-dominated and can report absurd rates
        dt = max(wallt - _base, 0.05 * wallt)
        return C * T * ITERS / dt / 1e6

    def timeit_stable(fn, *fargs, reps=5):
        """Adaptive + repeated timing (VERDICT r4 #4): grow the scan
        length until the wall is compute-dominated (≥ 6× the dispatch
        base, i.e. ≥ ~200 ms), then measure ``reps`` walls and report
        min-based Msps WITH the observed spread.  The r4 IIR rows were
        taken at sub-100 ms walls where the tunnel's dispatch variance
        produced ±30% between harness contexts; at 6× base the spread
        collapses below the calib-artifact's 10% gate."""
        n = ITERS

        def make(length):
            @jax.jit
            def go(*a):
                def body(c, _):
                    return _probe(fn(a[0] + c, *a[1:])), ()
                c, _ = lax.scan(body, jnp.float32(0), None, length=length)
                return c
            return go

        go = make(n)
        for _r in range(6):
            np.asarray(go(*fargs))
            t1 = time.perf_counter()
            np.asarray(go(*fargs))
            wall = time.perf_counter() - t1
            if wall >= 6.0 * _base or n >= 100000:
                break
            n *= min(16, max(2, int(6.0 * _base / max(wall, 1e-9)) + 1))
            go = make(n)
        walls = []
        for _r in range(reps):
            t1 = time.perf_counter()
            np.asarray(go(*fargs))
            walls.append(time.perf_counter() - t1)
        walls = np.asarray(walls)
        dts = np.maximum(walls - _base, 0.05 * walls)
        msps = C * T * n / dts / 1e6
        return {
            "msps": round(float(msps.max()), 1),      # min wall
            "msps_median": round(float(np.median(msps)), 1),
            "spread_pct": round(
                100.0 * float((dts.max() - dts.min()) / dts.min()), 1),
            "scan_iters": n,
        }

    def report(**rec):
        print(json.dumps(rec), flush=True)
        log(json.dumps(rec))

    taps = lz.firwin(1024, 0.25, window="hamming")
    rtaps = lz.resample_taps(147, 160, 64)

    # ---- chain: 1024-tap FIR + 147/160 resample (the headline) ----------
    if want("chain"):
        from llzlab_tpu.kernels import fused_fir_resample as ff

        y64 = ss.lfilter(taps, [1.0], x_np[0].astype(np.float64))
        z64 = ss.upfirdn(rtaps, y64, 147, 160)

        def chain_snr(z):
            ours = np.asarray(z[0], np.float64)
            return snr_db(z64[: ours.shape[0]], ours)

        k = len(rtaps) // 147
        interp = jax.default_backend() not in ("tpu", "axon")
        for prec in ("high", "highest"):
            os.environ["LLZ_MATMUL_PRECISION"] = prec
            jax.clear_caches()  # precision env is captured at trace time
            hlen = fir_mod.fir_state_len(1024, method="block2")
            f0 = jnp.zeros((C, hlen), jnp.float32)
            r0 = jnp.zeros((C, k - 1), jnp.float32)

            @jax.jit
            def chain_xla(x, f=f0, r=r0):
                y, _ = lz.fir_filter(x, taps, method="block2", zi=f,
                                     return_zf=True)
                z, _ = lz.resample_poly(y, 147, 160, taps=rtaps, zi=r,
                                        return_zf=True)
                return z

            z = chain_xla(x)
            report(op="chain", engine="block2+resample", precision=prec,
                   msps=round(timeit(chain_xla, x), 1),
                   snr=round(chain_snr(z), 1))

            if ff.fused_supports(C, 1024, 147, 160, k, T):
                st0 = jnp.zeros((C, ff.fused_state_len(1024)), jnp.float32)

                @jax.jit
                def chain_fused(x, st=st0, _p=prec):
                    z, _ = ff.fused_fir_resample_pallas(
                        x, taps, 147, 160, rtaps, zi=st, return_zf=True,
                        mode=_p, interpret=interp, rs_batch=4)
                    return z

                z = chain_fused(x)
                for rep in range(2):  # run-to-run variance check (tunnel)
                    report(op="chain", engine="fused_pallas", precision=prec,
                           rep=rep, msps=round(timeit(chain_fused, x), 1),
                           snr=round(chain_snr(z), 1))
        os.environ["LLZ_MATMUL_PRECISION"] = "highest"

    # ---- fir: engines at 1024 taps ---------------------------------------
    if want("fir"):
        ref = ss.lfilter(taps, [1.0], x_np[:2].astype(np.float64), axis=-1)
        for method in ("ols", "block2", "im2col"):
            for prec in ("high", "highest"):
                os.environ["LLZ_MATMUL_PRECISION"] = prec
                jax.clear_caches()  # precision env captured at trace time
                hlen = fir_mod.fir_state_len(1024, method=method)
                st0 = jnp.zeros((C, hlen), jnp.float32)

                @jax.jit
                def f(x, st=st0, _m=method):
                    y, _ = lz.fir_filter(x, taps, method=_m, zi=st,
                                         return_zf=True)
                    return y

                y = np.asarray(f(x)[:2])
                report(op="fir", engine=method, precision=prec,
                       msps=round(timeit(f, x), 1),
                       snr=round(snr_db(ref, y), 1))
        os.environ["LLZ_MATMUL_PRECISION"] = "highest"

    # ---- iir: the sosfilt engine matrix (ops/iir_select.py source) ------
    if want("iir"):
        iir_rows = []
        sos8 = lz.peaking_eq_sos(
            [100, 300, 700, 1500, 3000, 6000, 10000, 15000],
            [3, -4, 2, 5, -3, 4, -2, 3], 48000, q=1.0)
        t3 = (T // 4096) * 4096
        x3 = x[:, :t3]
        ref = ss.sosfilt(np.asarray(sos8, np.float64),
                         x_np[:2, :t3].astype(np.float64), axis=-1)
        st0 = jnp.zeros((C, 8, 2), jnp.float32)

        @jax.jit
        def scan_f(x, st=st0):
            y, _ = lz.sosfilt(sos8, x, zi=st, block_size=4096,
                              return_zf=True)
            return y

        y = np.asarray(scan_f(x3)[:2])
        iir_rows.append(dict(engine="scan", precision="f32",
                             snr=round(snr_db(ref, y), 1),
                             **timeit_stable(scan_f, x3)))
        report(op="iir", **iir_rows[-1])

        for prec in ("highest", "high"):
            @jax.jit
            def mm_f(x, st=st0, _p=prec):
                y, _ = lz.sosfilt_matmul(sos8, x, zi=st, return_zf=True,
                                         precision=_p)
                return y

            y = np.asarray(mm_f(x3)[:2])
            iir_rows.append(dict(engine="matmul", precision=prec,
                                 snr=round(snr_db(ref, y), 1),
                                 **timeit_stable(mm_f, x3)))
            report(op="iir", **iir_rows[-1])

        if args.write_calib:
            from llzlab_tpu.ops.iir_select import calib_path

            # Gate (VERDICT r4 #4): an artifact built from walls with
            # >10% run-to-run spread would bake measurement noise into
            # engine selection — refuse to write it.
            bad = [r for r in iir_rows if r["spread_pct"] >= 10.0]
            if bad:
                log(f"calib NOT written: spread >= 10% on {bad}")
            else:
                kind = jax.devices()[0].device_kind
                path = calib_path(kind)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "w") as f:
                    json.dump({
                        "device_kind": kind,
                        "workload": "8-section peaking-EQ cascade, "
                                    f"{C}ch x {t3}",
                        "channels": C,
                        "block": t3,
                        "net_of_dispatch_ms": round(_base * 1e3, 2),
                        "measured": iir_rows,
                    }, f, indent=1)
                log(f"calibration artifact written: {path}")

    def timeit_n(fn, samples, iters, *fargs):
        """Like timeit but with explicit sample count / scan length."""
        @jax.jit
        def go(*a):
            def body(c, _):
                return _probe(fn(a[0] + c, *a[1:])), ()
            c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        r = go(*fargs); r.block_until_ready()
        t1 = time.perf_counter()
        r = go(*fargs); r.block_until_ready()
        wallt = time.perf_counter() - t1
        dt = max(wallt - _base, 0.05 * wallt)
        return samples * iters / dt / 1e6

    # ---- fir1ch: config-1 spec shape (VERDICT r2 missing #5) -------------
    # 1 channel × 10 s of 48 kHz audio, 1024-tap lowpass; the fold-into-M
    # dispatch routes this to the Pallas kernel with time-blocks as rows.
    if want("fir1ch"):
        t1ch = 480000 // 1024 * 1024
        x1 = jnp.asarray(x_np[:1, :t1ch]) if T >= t1ch else jnp.asarray(
            rng.standard_normal((1, t1ch)).astype(np.float32))
        ref = ss.lfilter(taps, [1.0],
                         np.asarray(x1, np.float64), axis=-1)
        n1 = max(ITERS * 10, 50)
        for prec in ("high", "highest"):
            os.environ["LLZ_MATMUL_PRECISION"] = prec
            jax.clear_caches()
            st0 = jnp.zeros((1, 1024), jnp.float32)

            @jax.jit
            def f1(x, st=st0):
                y, _ = lz.fir_filter(x, taps, method="block2", zi=st,
                                     return_zf=True)
                return y

            y = np.asarray(f1(x1))
            report(op="fir1ch", engine="block2(fold)", precision=prec,
                   t=t1ch, iters=n1,
                   msps=round(timeit_n(f1, t1ch, n1, x1), 1),
                   snr=round(snr_db(ref, y), 1))
        os.environ["LLZ_MATMUL_PRECISION"] = "highest"

    # ---- fusedsweep: fused kernel tile-parameter sweep (VERDICT r2 #1) ---
    if want("fusedsweep"):
        from llzlab_tpu.kernels import fused_fir_resample as ff
        from llzlab_tpu.kernels import block2_fir as bf

        k = len(rtaps) // 147
        interp = jax.default_backend() not in ("tpu", "axon")
        y64 = ss.lfilter(taps, [1.0], x_np[0].astype(np.float64))
        z64 = ss.upfirdn(rtaps, y64, 147, 160)
        st0 = jnp.zeros((C, ff.fused_state_len(1024)), jnp.float32)
        for gb in (2, 4, 8):
            for rs_batch in (4, 8, 16):
                @jax.jit
                def cf(x, st=st0, _g=gb, _r=rs_batch):
                    z, _ = ff.fused_fir_resample_pallas(
                        x, taps, 147, 160, rtaps, zi=st, return_zf=True,
                        mode="high", interpret=interp, gb=_g, rs_batch=_r)
                    return z

                try:
                    z = cf(x)
                    ours = np.asarray(z[0], np.float64)
                    report(op="fusedsweep", gb=gb, rs_batch=rs_batch,
                           msps=round(timeit(cf, x), 1),
                           snr=round(snr_db(z64[: ours.shape[0]], ours), 1))
                except Exception as e:  # VMEM overflow etc. — record it
                    report(op="fusedsweep", gb=gb, rs_batch=rs_batch,
                           error=str(e)[:120])

        # per-stage attribution: FIR-only Pallas kernel on the same shapes
        # (stage-2 cost ≈ chain step − this)
        xpad0 = jnp.concatenate(
            [jnp.zeros((C, 1024), jnp.float32), x], axis=1)

        @jax.jit
        def fir_only(xp):
            return bf.block2_fir_pallas(xp, taps, 1024, mode="high",
                                        interpret=interp)

        report(op="fusedsweep", stage="fir_only_pallas",
               msps=round(timeit(fir_only, xpad0), 1))

    # ---- fusedopt: overhead-subtracted kernel optimization probes --------
    # The fixed per-dispatch + D2H-fetch latency of the dev-box tunnel is
    # measured with an empty step and subtracted, so these numbers rank
    # kernel variants by COMPUTE time (the raw timeit numbers at low
    # iters are latency-polluted — r3 probe 1 showed ~1.4 ms/iter).
    if want("fusedopt"):
        from llzlab_tpu.kernels import fused_fir_resample as ff
        from llzlab_tpu.kernels import block2_fir as bf

        interp = jax.default_backend() not in ("tpu", "axon")

        def wall(fn, iters, *fargs):
            @jax.jit
            def go(*a):
                def body(c, _):
                    return _probe(fn(a[0] + c, *a[1:])), ()
                c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
                return c

            r = go(*fargs); r.block_until_ready()
            t1 = time.perf_counter()
            r = go(*fargs); r.block_until_ready()
            return time.perf_counter() - t1

        n = max(ITERS, 30)

        @jax.jit
        def empty(v):
            return v * 1.0000001  # one real op so XLA can't fold it away

        base = wall(lambda v: empty(v), n, x[:, :256])
        log(f"fixed overhead: {base*1e3/n:.3f} ms/iter (n={n})")

        def net_msps(fn, samples, *fargs):
            dt = wall(fn, n, *fargs) - base
            return samples * n / max(dt, 1e-9) / 1e6

        # FIR-only kernel: the three bf16x3 strategies
        xpad0 = jnp.concatenate(
            [jnp.zeros((C, 1024), jnp.float32), x], axis=1)
        for mode in ("high", "highcat", "highest"):
            @jax.jit
            def fo(xp, _m=mode):
                return bf.block2_fir_pallas(xp, taps, 1024, mode=_m,
                                            interpret=interp)

            report(op="fusedopt", stage="fir_only", mode=mode,
                   msps=round(net_msps(fo, C * T, xpad0), 1))

        # fused chain tile params at the sweep-1 winners, plus the
        # dense-weight "wide" variant (one K=2·block N=block dot per
        # y-block: 1.78× the MACs of the banded form but full-width N —
        # measured r3: 6.4 vs 7.8 Gsps, the banded form wins, kept as a
        # recorded design decision)
        st0 = jnp.zeros((C, ff.fused_state_len(1024)), jnp.float32)
        for gb, rsb, wd in ((2, 8, False), (4, 8, False), (8, 8, False),
                            (2, 16, False), (2, 8, True), (4, 8, True)):
            @jax.jit
            def cf(v, st=st0, _g=gb, _r=rsb, _w=wd):
                z, _ = ff.fused_fir_resample_pallas(
                    v, taps, 147, 160, rtaps, zi=st, return_zf=True,
                    mode="high", interpret=interp, gb=_g, rs_batch=_r,
                    wide=_w)
                return z

            report(op="fusedopt", stage="chain", gb=gb, rs_batch=rsb,
                   wide=wd, msps=round(net_msps(cf, C * T, x), 1))

        # XLA block2+resample chain, same harness, for a fair delta
        hlen = fir_mod.fir_state_len(1024, method="block2")
        f0 = jnp.zeros((C, hlen), jnp.float32)
        r0 = jnp.zeros((C, 63), jnp.float32)
        os.environ["LLZ_MATMUL_PRECISION"] = "high"
        jax.clear_caches()

        @jax.jit
        def cx(v, f=f0, r=r0):
            y, _ = lz.fir_filter(v, taps, method="block2", zi=f,
                                 return_zf=True)
            z, _ = lz.resample_poly(y, 147, 160, taps=rtaps, zi=r,
                                    return_zf=True)
            return z

        report(op="fusedopt", stage="chain_xla", precision="high",
               msps=round(net_msps(cx, C * T, x), 1))
        os.environ["LLZ_MATMUL_PRECISION"] = "highest"

    # ---- fft: standalone FFT kernel rows (VERDICT r2 missing #1) ---------
    # r4: the old probe consumed only [0, -1:] of the batch — the same
    # DCE/LICM leak the chain harness was cured of in r3.  The probe is
    # now the full complex-output sum (same anti-DCE form as bench.py).
    if want("fft"):
        from llzlab_tpu.ops import transform as tr

        nfft = 2048
        frames = (C * T) // nfft
        xf = x[:, : frames // C * C * nfft].reshape(C, -1, nfft)
        ref = np.fft.rfft(np.asarray(xf[:2], np.float64), axis=-1)
        engines = []
        for prc in ("highest", "high"):
            for eng in ("real", "real16", "dense", "pack"):
                engines.append((
                    f"matmul_{eng}", prc,
                    lambda v, _e=eng, _p=prc: tr._jit_pack(
                        *tr._rfft_matmul_jit(v, nfft, _p, _e)),
                ))
        engines.append(("xla", "n/a",
                        lambda v: jnp.fft.rfft(v, n=nfft, axis=-1)))
        if args.cpu:
            engines = engines[-1:]
        samples = xf.shape[0] * xf.shape[1] * nfft
        for name, prc, ffn in engines:
            try:
                y = ffn(xf[:2])
                yh = (np.asarray(jnp.real(y), np.float64)
                      + 1j * np.asarray(jnp.imag(y), np.float64))
                report(op="fft", engine=name, precision=prc, nfft=nfft,
                       msps=round(timeit_n(ffn, samples, ITERS, xf), 1),
                       snr=round(snr_db(ref, yh), 1))
            except Exception as e:
                report(op="fft", engine=name, precision=prc,
                       error=str(e)[:160])

        # inverse engines: time irfft(spec) on a precomputed spectrum
        spec_dev = tr._jit_pack(*tr._rfft_matmul_jit(xf, nfft, "highest",
                                                     "real"))
        refi = np.fft.irfft(
            np.asarray(np.fft.rfft(np.asarray(xf[:2], np.float64),
                                   axis=-1)), nfft, axis=-1)
        for prc in ("highest", "high"):
            for eng in ("real", "dense", "pack"):
                def ifn(v, _e=eng, _p=prc):
                    sr, si = tr._jit_split(v)
                    return tr._irfft_matmul_jit(sr, si, nfft, _p, _e)
                try:
                    y = np.asarray(ifn(spec_dev[:2]), np.float64)
                    report(op="ifft", engine=eng, precision=prc,
                           nfft=nfft,
                           msps=round(timeit_n(ifn, samples, ITERS,
                                               spec_dev), 1),
                           snr=round(snr_db(refi, y), 1))
                except Exception as e:
                    report(op="ifft", engine=eng, precision=prc,
                           error=str(e)[:160])

    # ---- fftsize: rfft engine ranking ACROSS SIZES (VERDICT r4 #7) ------
    # The r4 auto rule (dense at high for ANY power of two) was measured
    # only at n=2048 while the dense table is O(n²) and its MACs/sample
    # grow as n; this suite measures the ranking over the size range the
    # API accepts so the auto thresholds are evidence, not extrapolation.
    # NOT in --suite all: run explicitly (it owns the chip for minutes).
    if want("fftsize"):
        from llzlab_tpu.ops import transform as tr

        for nfft in (int(s) for s in args.fft_sizes.split(",")):
            nfr = T // nfft
            xf = x[:, : nfr * nfft].reshape(C, nfr, nfft)
            ref = np.fft.rfft(np.asarray(xf[:2], np.float64), axis=-1)
            samples = C * nfr * nfft
            # timeit_stable (not timeit_n): these rows drive the auto
            # thresholds, so they need compute-dominated walls + a
            # recorded spread, same as the IIR calib rows (an early
            # short-wall run reported 4096-highest "faster" than 2048
            # for a strictly-more-MACs formulation — pure noise).
            rows = []
            for prc in ("high", "highest"):
                for eng in ("dense", "real", "pack"):
                    def ffn(v, _e=eng, _p=prc, _n=nfft):
                        return tr._jit_pack(
                            *tr._rfft_matmul_jit(v, _n, _p, _e))
                    try:
                        y = ffn(xf[:2])
                        yh = (np.asarray(jnp.real(y), np.float64)
                              + 1j * np.asarray(jnp.imag(y), np.float64))
                        rows.append(dict(
                            op="fft", nfft=nfft, engine=eng, precision=prc,
                            snr=round(snr_db(ref, yh), 1),
                            **timeit_stable(ffn, xf, reps=3)))
                    except Exception as e:
                        rows.append(dict(op="fft", nfft=nfft, engine=eng,
                                         precision=prc,
                                         error=str(e)[:160]))
                    report(**rows[-1])
            def xfn(v, _n=nfft):
                return jnp.fft.rfft(v, n=_n, axis=-1)
            y = xfn(xf[:2])
            yh = (np.asarray(jnp.real(y), np.float64)
                  + 1j * np.asarray(jnp.imag(y), np.float64))
            report(op="fft", nfft=nfft, engine="xla", precision="n/a",
                   snr=round(snr_db(ref, yh), 1),
                   **timeit_stable(xfn, xf, reps=3))

    # ---- ifftsize: irfft engine ranking across sizes (r5 gap #4) --------
    if want("ifftsize"):
        from llzlab_tpu.ops import transform as tr

        for nfft in (int(s) for s in args.fft_sizes.split(",")):
            nfr = T // nfft
            xf = x[:, : nfr * nfft].reshape(C, nfr, nfft)
            spec_dev = tr._jit_pack(*tr._rfft_matmul_jit(
                xf, nfft, "highest", "real"))
            refi = np.fft.irfft(
                np.fft.rfft(np.asarray(xf[:2], np.float64), axis=-1),
                nfft, axis=-1)
            for prc in ("high", "highest"):
                for eng in ("dense", "real", "pack"):
                    def ifn(v, _e=eng, _p=prc, _n=nfft):
                        sr, si = tr._jit_split(v)
                        return tr._irfft_matmul_jit(sr, si, _n, _p, _e)
                    try:
                        y = np.asarray(ifn(spec_dev[:2]), np.float64)
                        report(op="ifft", nfft=nfft, engine=eng,
                               precision=prc,
                               snr=round(snr_db(refi, y), 1),
                               **timeit_stable(ifn, spec_dev, reps=3))
                    except Exception as e:
                        report(op="ifft", nfft=nfft, engine=eng,
                               precision=prc, error=str(e)[:160])

    log("done")


if __name__ == "__main__":
    main()
