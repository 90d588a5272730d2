"""Wideband channelizer tool — the flagship sharded chain (BASELINE.json:11).

    python -m llzlab_tpu.cli.channelizer -i wide.wav -o spec.npz \
        [--fft 2048] [--mesh-channel N --mesh-time M] [--cpu]

Reads a multichannel WAV (or synthesises --synth channels of noise),
shards (channel, time) over the available devices, runs the FIR →
resample → FFT chain, and writes the spectra as an ``.npz``.
"""

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", "-i", default=None)
    p.add_argument("--output", "-o", required=True)
    p.add_argument("--synth", type=int, default=None,
                   help="synthesise N channels of noise instead of reading")
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--rate", type=int, default=48000)
    p.add_argument("--fft", type=int, default=2048)
    p.add_argument("--fir-taps", type=int, default=1024)
    p.add_argument("--fir-method", default="ols", choices=["ols", "direct"])
    p.add_argument("--mesh-channel", type=int, default=None)
    p.add_argument("--mesh-time", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--metrics", default=None)
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import llzlab_tpu as lz
    from llzlab_tpu.chains.channelizer import Channelizer
    from llzlab_tpu.io.wav import read_wav
    from llzlab_tpu.parallel.mesh import (
        CHANNEL_AXIS, TIME_AXIS, make_dsp_mesh,
    )
    from llzlab_tpu.utils.metrics import MetricsLogger

    log = MetricsLogger(args.metrics)

    if args.input:
        x, rate = read_wav(args.input)
    else:
        c = args.synth or 8
        rng = np.random.default_rng(0)
        x = rng.standard_normal(
            (c, int(args.seconds * args.rate))
        ).astype(np.float32)
        rate = args.rate

    chan = Channelizer(
        fir_taps=lz.firwin(args.fir_taps, 0.4, window="hamming"),
        fft_n=args.fft,
        fir_method=args.fir_method,
    )
    mesh = make_dsp_mesh(args.mesh_channel, args.mesh_time)
    nc, nt = mesh.shape[CHANNEL_AXIS], mesh.shape[TIME_AXIS]
    m = chan.block_multiple() * nt
    c, t = x.shape
    if c % nc:
        pad_c = nc - c % nc
        x = np.pad(x, ((0, pad_c), (0, 0)))
        c += pad_c
    t_use = (t // m) * m
    if t_use == 0:
        print(f"input too short: need ≥ {m} samples", file=sys.stderr)
        sys.exit(1)
    x = x[:, :t_use]
    log.event("start", channels=c, samples=t_use, mesh=f"{nc}x{nt}",
              backend=jax.default_backend())

    xd = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(CHANNEL_AXIS, TIME_AXIS))
    )
    st_sh = NamedSharding(mesh, P(CHANNEL_AXIS, None))
    state = tuple(jax.device_put(s, st_sh) for s in chan.init_state(c))
    step = chan.sharded_step(mesh)
    t0 = time.perf_counter()
    spec, state = step(xd, state)
    spec.block_until_ready()
    dt = time.perf_counter() - t0
    log.stage("channelizer", c * t_use, dt)
    np.savez(args.output, spectra=np.asarray(spec), rate=rate * 147 // 160,
             fft_n=args.fft)
    log.event("done", out=args.output, shape=list(spec.shape))


if __name__ == "__main__":
    main()
