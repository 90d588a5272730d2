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


def run_all(iters: int = 10, seconds: float = 2.0, channels5: int = 64):
    """Measure the five BASELINE configs on the current backend.

    ``channels5`` bounds the channelizer row: the BASELINE.json:11 spec
    shape is 1024 channels on a v5p-16 pod; on one chip the row reports
    the requested channel count explicitly so the record states what was
    actually run (tunnel H2D makes >256ch impractical on the dev box).
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

    def run_scanned(step_fn, state0, x, n, fetch=lambda z: z[0, -1]):
        @jax.jit
        def go(v, st):
            def body(c, _):
                out, c2 = step_fn(v, c)
                return c2, fetch(out)
            _, probes = lax.scan(body, st, None, length=n)
            return probes

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
    taps = lz.firwin(1024, 0.25, window="hamming")
    t1 = (T // 3072) * 3072
    x1 = rng.standard_normal((1, t1)).astype(np.float32)
    m1 = "block2" if on_tpu else "ols"  # measured winners per backend
    h = fir_state_len(1024, method=m1)

    def fir_step(v, st):
        y, zf = lz.fir_filter(v, taps, method=m1, zi=st, return_zf=True)
        return y, zf

    dt = run_scanned(fir_step, jnp.zeros((1, h)), jnp.asarray(x1), iters)
    y = np.asarray(lz.fir_filter(x1, taps, method=m1))
    ref = ss.lfilter(taps, [1.0], x1.astype(np.float64), axis=-1)
    report("fir_lowpass_1ch", t1 / dt / 1e6, _snr(ref, y), engine=m1)

    # ---- config 2: 147/160 resample, 8 channels -------------------------
    rtaps = lz.resample_taps(147, 160, 64)
    t2 = (T // 160) * 160
    x2 = rng.standard_normal((8, t2)).astype(np.float32)

    def rs_step(v, st):
        y, zf = lz.resample_poly(v, 147, 160, taps=rtaps, zi=st,
                                 return_zf=True)
        return y, zf

    dt = run_scanned(rs_step, jnp.zeros((8, 63)), jnp.asarray(x2), iters)
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
    t4 = (T // 2048) * 2048
    x4 = rng.standard_normal((256, t4)).astype(np.float32)
    gain = jnp.asarray(np.linspace(1.0, 0.5, 1025).astype(np.float32))

    def stft_step(v, st):
        S = lz.stft(v, n_fft=2048, hop=512)
        y = lz.istft(S * gain, n_fft=2048, hop=512, length=v.shape[-1])
        return y, st

    dt = run_scanned(stft_step, jnp.zeros((1,)), jnp.asarray(x4), iters)
    # golden: unity-path reconstruction quality in the interior
    yu = np.asarray(lz.istft(lz.stft(x4[:2]), length=t4))
    report("stft_gain_256ch", 256 * t4 / dt / 1e6,
           _snr(x4[:2, 2048:-2048], yu[:, 2048:-2048]))

    # ---- config 5: channelizer chain (single chip; sharded variant is
    # exercised by __graft_entry__.dryrun_multichip / the pod driver) -----
    from llzlab_tpu.chains.channelizer import Channelizer

    m5 = "block2" if on_tpu else "ols"
    chan = Channelizer(fir_method=m5)
    m = chan.block_multiple()
    c5 = int(channels5)
    x5 = rng.standard_normal((c5, m)).astype(np.float32)

    def chan_step(v, st):
        spec, st2 = chan.step(v, st)
        return spec, st2

    dt = run_scanned(
        chan_step, chan.init_state(c5), jnp.asarray(x5), iters,
        fetch=lambda z: jnp.abs(z[0, -1, 0]),
    )
    # SNR vs float64 scipy golden on a 2-channel slice of the same chain
    # (channels are independent — per-channel math is identical).
    # Fetch real/imag separately: complex64 D2H is unimplemented on the
    # axon tunnel backend.
    spec_dev = chan.step(jnp.asarray(x5[:2]), chan.init_state(2))[0]
    spec = (np.asarray(jnp.real(spec_dev))
            + 1j * np.asarray(jnp.imag(spec_dev)))
    y64 = ss.lfilter(chan.fir_taps, [1.0], x5[:2].astype(np.float64),
                     axis=-1)
    z64 = np.stack([
        ss.upfirdn(chan.resample_taps, y64[c], chan.up, chan.down)
        for c in range(2)
    ])
    n_out = spec.shape[1] * chan.fft_n
    zf64 = z64[:, :n_out].reshape(2, -1, chan.fft_n)
    ref5 = np.fft.rfft(zf64, axis=-1)
    report("channelizer_1chip", c5 * m / dt / 1e6, _snr(ref5, spec),
           channels=c5, block=m, engine=m5,
           spec_shape="BASELINE.json:11 is 1024ch on v5p-16; single-chip "
                      f"row runs {c5}ch (tunnel-H2D-bound dev box)")
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--channels5", type=int, default=64,
                   help="channelizer channel count (spec shape is 1024; "
                        "dev-box default 64 keeps H2D under the tunnel cap)")
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
