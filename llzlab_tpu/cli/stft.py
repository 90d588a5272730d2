"""Spectral-gain tool (STFT → per-bin gain → iSTFT), the BASELINE.json:10
chain as a CLI.

    python -m llzlab_tpu.cli.stft -i in.wav -o out.wav \
        --notch 1000 2000            # zero bins covering 1–2 kHz
    python -m llzlab_tpu.cli.stft -i in.wav -o out.wav --gain-db -6
"""

import argparse

import numpy as np

from llzlab_tpu.cli.common import add_io_args, pin_backend, run_chain_tool


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_io_args(p)
    p.add_argument("--n-fft", type=int, default=2048)
    p.add_argument("--hop", type=int, default=None)
    p.add_argument("--window", default="hann")
    p.add_argument("--gain-db", type=float, default=0.0,
                   help="broadband gain applied in the spectral domain")
    p.add_argument("--notch", type=float, nargs=2, default=None,
                   metavar=("F_LO", "F_HI"), help="zero bins in [f_lo, f_hi] Hz")
    args = p.parse_args(argv)
    pin_backend(args)

    from llzlab_tpu.io.wav import wav_info
    from llzlab_tpu.pipeline import Chain, SpectralGainStage

    rate = wav_info(args.input).sample_rate
    bins = args.n_fft // 2 + 1
    gain = np.full(bins, 10.0 ** (args.gain_db / 20.0), np.float32)
    if args.notch:
        f_lo, f_hi = args.notch
        k = np.arange(bins) * rate / args.n_fft
        gain[(k >= f_lo) & (k <= f_hi)] = 0.0
    chain = Chain([
        SpectralGainStage(gain, n_fft=args.n_fft, hop=args.hop,
                          window=args.window)
    ])
    run_chain_tool(args, chain, tool="stft")


if __name__ == "__main__":
    main()
