#!/usr/bin/env python
"""Bench all five BASELINE workloads (BASELINE.json:6-12) on one chip.

Importable: ``run_all(...)`` returns one dict per workload (bench.py
embeds them in the driver JSON record).  As a script, prints one JSON
line per workload (stderr gets human detail).  Each measurement loop
runs on-device via lax.scan (see bench.py).

    python bench/all_configs.py [--cpu] [--iters 10] [--channels5 64]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _snr(ref, y):
    ref = np.asarray(ref)
    y = np.asarray(y)
    e = np.abs(ref - y)
    return float(10 * np.log10(np.sum(np.abs(ref) ** 2) / np.sum(e**2)))


def run_all(iters: int = 10, seconds: float = 2.0, channels5: int = 1024):
    """Measure the five BASELINE configs on the current backend.

    ``channels5``: channelizer row channel count — default 1024, the
    BASELINE.json:11 spec shape.  Input is generated ON DEVICE inside the
    jit region (keyed jax.random), so the dev box's tunnel H2D cap never
    touches the (1024, block) operand; the SNR golden checks a small
    channel slice fetched D2H (channels are independent).
    """
    import jax
    import jax.numpy as jnp
    import scipy.signal as ss
    from jax import lax

    import llzlab_tpu as lz
    from llzlab_tpu.ops.fir import fir_state_len

    dev = jax.devices()[0]
    _log(f"backend={jax.default_backend()} {dev.device_kind}")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    rng = np.random.default_rng(0)
    results = []

    def run_scanned(step_fn, state0, x, n, fetch=None):
        """Per-step seconds over an n-step on-device lax.scan.

        n must be large enough that the fixed per-call dispatch + D2H
        fetch latency of the dev-box tunnel (~tens of ms) is amortized —
        cheap configs pass a scaled-up n (VERDICT r2: config 1/2 rows
        were latency-bound, not compute-bound).

        Anti-DCE/LICM: the probe is the FULL-output sum, scaled to an
        underflowing ~1e-27 and added to the next iteration's input —
        every element is consumed and the body is never loop-invariant,
        so XLA cannot slice away or hoist work for pure-XLA engines
        (the old ``z[0, -1]`` probe let it).  ``fetch`` is kept for
        signature compatibility and ignored.
        """
        @jax.jit
        def go(v, st):
            def body(carry, _):
                c, eps = carry
                out, c2 = step_fn(v + eps, c)
                e2 = ((jnp.sum(jnp.real(out)) + (jnp.sum(jnp.imag(out))
                       if jnp.iscomplexobj(out) else 0.0))
                      * 1e-30).astype(jnp.float32)
                return (c2, e2), ()
            (c, eps), _ = lax.scan(
                body, (st, jnp.float32(0)), None, length=n)
            return eps

        _ = np.asarray(go(x, state0))
        t0 = time.perf_counter()
        _ = np.asarray(go(x, state0))
        return (time.perf_counter() - t0) / n

    def report(name, msps, snr_db, **extra):
        rec = {"config": name, "msps_per_chip": round(msps, 1),
               "snr_db": round(snr_db, 1), **extra}
        results.append(rec)
        _log(json.dumps(rec))
        return rec

    T = int(48000 * seconds)

    # ---- config 1: 1024-tap FIR lowpass, 1 channel ----------------------
    # Spec shape is 10 s of 48 kHz audio (BASELINE.json:7); the scan count
    # is scaled up because a single-channel step is microseconds of
    # compute against ~tens of ms of fixed tunnel latency.
    taps = lz.firwin(1024, 0.25, window="hamming")
    t1 = (480000 // 3072) * 3072
    x1 = rng.standard_normal((1, t1)).astype(np.float32)
    m1 = "block2" if on_tpu else "ols"  # measured winners per backend
    h = fir_state_len(1024, method=m1)

    def fir_step(v, st):
        y, zf = lz.fir_filter(v, taps, method=m1, zi=st, return_zf=True)
        return y, zf

    dt = run_scanned(fir_step, jnp.zeros((1, h)), jnp.asarray(x1),
                     iters * 20)
    y = np.asarray(lz.fir_filter(x1, taps, method=m1))
    ref = ss.lfilter(taps, [1.0], x1.astype(np.float64), axis=-1)
    eng1 = m1 + ("(fold)" if on_tpu and m1 == "block2" else "")
    report("fir_lowpass_1ch", t1 / dt / 1e6, _snr(ref, y), engine=eng1,
           seconds=10)

    # ---- config 2: 147/160 resample, 8 channels -------------------------
    rtaps = lz.resample_taps(147, 160, 64)
    t2 = (T // 160) * 160
    x2 = rng.standard_normal((8, t2)).astype(np.float32)

    def rs_step(v, st):
        y, zf = lz.resample_poly(v, 147, 160, taps=rtaps, zi=st,
                                 return_zf=True)
        return y, zf

    dt = run_scanned(rs_step, jnp.zeros((8, 63)), jnp.asarray(x2),
                     iters * 10)
    y = np.asarray(lz.resample_poly(x2[:1], 147, 160, taps=rtaps))
    ref = ss.upfirdn(rtaps, x2[0].astype(np.float64), 147, 160)[: y.shape[-1]]
    report("resample_8ch", 8 * t2 / dt / 1e6, _snr(ref, y[0]))

    # ---- config 3: 8-section EQ, 64 channels ----------------------------
    sos8 = lz.peaking_eq_sos(
        [100, 200, 400, 800, 1600, 3200, 6400, 12800],
        [3, -4, 5, -2, 6, -3, 2, -5], 48000.0, q=1.0,
    )
    t3 = (T // 4096) * 4096
    x3 = rng.standard_normal((64, t3)).astype(np.float32)
    ref3 = ss.sosfilt(sos8, x3[:4].astype(np.float64), axis=-1)

    def sos_step(v, st):
        return lz.sosfilt(sos8, v, zi=st, block_size=4096, return_zf=True)

    dt = run_scanned(sos_step, jnp.zeros((64, 8, 2)), jnp.asarray(x3), iters)
    y = np.asarray(lz.sosfilt(sos8, x3[:4], block_size=4096))
    report("iir_eq_64ch", 64 * t3 / dt / 1e6, _snr(ref3, y), engine="scan")

    # Same workload on the MXU-matmul engine (ops/iir_matmul.py), at both
    # precision tiers — these rows are the source for the
    # ops/iir_select.py ENGINE_MATRIX numbers.
    for prec in ("highest", "high"):
        def sos_mm_step(v, st, _p=prec):
            return lz.sosfilt_matmul(sos8, v, zi=st, return_zf=True,
                                     precision=_p)

        dt = run_scanned(sos_mm_step, jnp.zeros((64, 8, 2)),
                         jnp.asarray(x3), iters)
        y = np.asarray(lz.sosfilt_matmul(sos8, x3[:4], precision=prec))
        report(f"iir_eq_64ch_matmul_{prec}", 64 * t3 / dt / 1e6,
               _snr(ref3, y), engine="matmul", precision=prec)

    # ---- config 4: STFT→gain→iSTFT, 256 channels ------------------------
    # The STREAMING SpectralGainStage (real per-bin gain, carried WOLA
    # state) is what gets timed and golden-checked — full-sample SNR
    # including block boundaries vs an independent f64 WOLA reference
    # (VERDICT r2 missing #6 / weak #5).
    from llzlab_tpu.pipeline.chain import SpectralGainStage

    t4 = (T // 4096) * 4096
    x4 = rng.standard_normal((256, t4)).astype(np.float32)
    gain_np = np.linspace(1.0, 0.5, 1025)
    stage = SpectralGainStage(gain_np.astype(np.float32))

    def stft_step(v, st):
        return stage.apply(v, st)

    dt = run_scanned(stft_step, stage.init_state((256,)),
                     jnp.asarray(x4), iters)

    def wola_gain_f64(xs, n_fft=2048, hop=512):
        """Independent numpy-f64 one-shot istft(gain·stft(x)) — causal
        framing at 0, periodic Hann, window-square envelope division."""
        w = ss.get_window("hann", n_fft).astype(np.float64)
        tt = xs.shape[-1]
        nf = 1 + (tt - n_fft) // hop
        idx = np.arange(n_fft) + hop * np.arange(nf)[:, None]
        fr = xs[:, idx] * w
        spec = np.fft.rfft(fr, axis=-1) * gain_np
        syn = np.fft.irfft(spec, n_fft, axis=-1) * w
        out_len = n_fft + (nf - 1) * hop
        y = np.zeros((xs.shape[0], out_len))
        env = np.zeros(out_len)
        for i in range(nf):
            y[:, i * hop : i * hop + n_fft] += syn[:, i]
            env[i * hop : i * hop + n_fft] += w * w
        return y / np.maximum(env, 1e-8)

    xs = x4[:2].astype(np.float64)
    st = stage.init_state((2,))
    half = t4 // 2
    ys = []
    for blk in (x4[:2, :half], x4[:2, half:]):
        yb, st = stage.apply(jnp.asarray(blk), st)
        ys.append(np.asarray(yb))
    ys.append(np.asarray(stage.flush(st)))
    ys = np.concatenate(ys, axis=-1)
    ref4 = wola_gain_f64(xs)
    cut = ys[:, stage.latency :]
    # Skip only the startup envelope ramp (first `latency` samples):
    # there the WOLA output divides by a near-zero window-square
    # envelope, amplifying rounding noise ~35 dB in ANY implementation
    # (two f64 runs differ the same way).  Every mid-stream block
    # boundary — the thing VERDICT r2 demanded evidence for — stays in
    # the window (the streamed run splits at t4/2).
    skip = stage.latency
    n4 = min(cut.shape[-1], ref4.shape[-1])
    snr4 = _snr(ref4[:, skip:n4], cut[:, skip:n4])
    report("stft_gain_256ch", 256 * t4 / dt / 1e6, snr4,
           engine="SpectralGainStage(streaming)",
           golden="f64 WOLA, all samples past the startup envelope "
                  "ramp (mid-stream block boundaries included)")

    # ---- config 5: channelizer chain at the spec channel count ----------
    # (single chip; the sharded variant is exercised by
    # __graft_entry__.dryrun_multichip / the pod driver).  Input is
    # GENERATED ON DEVICE so the dev-box tunnel H2D cap is irrelevant at
    # 1024 channels (VERDICT r2 missing #2).
    from llzlab_tpu.chains.channelizer import Channelizer

    chan = Channelizer()  # auto → fused Pallas on TPU, ols on CPU
    m = chan.block_multiple()
    c5 = int(channels5)

    @jax.jit
    def gen5(key):
        return jax.random.normal(key, (c5, m), jnp.float32)

    x5_dev = gen5(jax.random.PRNGKey(5))
    x5_dev.block_until_ready()

    def chan_step(v, st):
        spec, st2 = chan.step(v, st)
        return spec, st2

    dt = run_scanned(
        chan_step, chan.init_state(c5), x5_dev, iters,
        fetch=lambda z: jnp.abs(z[0, -1, 0]),
    )
    # SNR vs float64 scipy golden on an 8-channel slice of the same chain
    # (channels are independent — per-channel math is identical; 8 keeps
    # the fused kernel's channel envelope).  The slice is fetched D2H.
    nsnr = min(8, c5)
    x5s = np.asarray(x5_dev[:nsnr])
    spec_dev = chan.step(jnp.asarray(x5s), chan.init_state(nsnr))[0]
    # Fetch real/imag separately: complex64 D2H is unimplemented on the
    # axon tunnel backend.
    spec = (np.asarray(jnp.real(spec_dev))
            + 1j * np.asarray(jnp.imag(spec_dev)))[:2]
    y64 = ss.lfilter(chan.fir_taps, [1.0], x5s[:2].astype(np.float64),
                     axis=-1)
    z64 = np.stack([
        ss.upfirdn(chan.resample_taps, y64[c], chan.up, chan.down)
        for c in range(2)
    ])
    n_out = spec.shape[1] * chan.fft_n
    zf64 = z64[:, :n_out].reshape(2, -1, chan.fft_n)
    ref5 = np.fft.rfft(zf64, axis=-1)
    report("channelizer_1chip", c5 * m / dt / 1e6, _snr(ref5, spec),
           channels=c5, block=m, engine=chan.fir_method,
           input="on-device jax.random (no H2D)")
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--channels5", type=int, default=1024,
                   help="channelizer channel count (spec shape 1024; input "
                        "is generated on device so H2D is not a factor)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    results = run_all(iters=args.iters, seconds=args.seconds,
                      channels5=args.channels5)
    for rec in results:
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
