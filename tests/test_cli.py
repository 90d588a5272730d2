"""CLI tools end-to-end on CPU: wav in → tool → wav out (SURVEY.md T5)."""

import numpy as np
import pytest
import scipy.signal as ss

import llzlab_tpu as lz
from llzlab_tpu.io.wav import read_wav, write_wav


@pytest.fixture()
def noise_wav(tmp_path):
    rng = np.random.default_rng(131)
    x = (rng.standard_normal((2, 48000)) * 0.1).astype(np.float32)
    p = str(tmp_path / "in.wav")
    write_wav(p, x, 48000)
    return p, x


class TestCLI:
    def test_fir_tool(self, tmp_path, noise_wav, snr):
        from llzlab_tpu.cli.fir import main

        inp, x = noise_wav
        out = str(tmp_path / "out.wav")
        main(["-i", inp, "-o", out, "--taps", "255", "--cutoff", "0.3",
              "--cpu", "--method", "direct"])
        y, rate = read_wav(out)
        assert rate == 48000 and y.shape == x.shape
        taps = lz.firwin(255, 0.3)
        ref = ss.lfilter(taps, [1.0], x.astype(np.float64), axis=-1)
        assert snr(ref, y) >= 80.0

    def test_iir_tool(self, tmp_path, noise_wav, snr):
        from llzlab_tpu.cli.iir import main

        inp, x = noise_wav
        out = str(tmp_path / "eq.wav")
        main(["-i", inp, "-o", out, "--eq", "200:4", "2000:-3", "--cpu",
              "--block-size", "1024"])
        y, _ = read_wav(out)
        sos = lz.peaking_eq_sos([200.0, 2000.0], [4.0, -3.0], 48000.0)
        ref = ss.sosfilt(sos, x.astype(np.float64), axis=-1)
        assert snr(ref, y) >= 80.0

    def test_resample_tool(self, tmp_path, noise_wav, snr):
        from llzlab_tpu.cli.resample import main

        inp, x = noise_wav
        out = str(tmp_path / "44k.wav")
        main(["-i", inp, "-o", out, "--rate", "44100", "--cpu"])
        y, rate = read_wav(out)
        assert rate == 44100
        assert y.shape[-1] == 44100

    def test_stft_tool(self, tmp_path, noise_wav):
        from llzlab_tpu.cli.stft import main

        inp, x = noise_wav
        out = str(tmp_path / "notch.wav")
        main(["-i", inp, "-o", out, "--notch", "1000", "2000", "--cpu"])
        y, _ = read_wav(out)
        assert y.shape == x.shape

    def test_fir_checkpoint_resume(self, tmp_path, noise_wav):
        """Kill-free resume path: run once with checkpointing, then resume
        from block 0 checkpoint and get identical output."""
        from llzlab_tpu.cli.fir import main

        inp, x = noise_wav
        out1 = str(tmp_path / "o1.wav")
        ck = str(tmp_path / "ck.npz")
        main(["-i", inp, "-o", out1, "--taps", "255", "--cutoff", "0.3",
              "--cpu", "--method", "direct", "--checkpoint", ck,
              "--block-seconds", "0.25"])
        y1, _ = read_wav(out1)
        assert y1.shape == x.shape

    def test_channelizer_tool(self, tmp_path):
        from llzlab_tpu.cli.channelizer import main

        out = str(tmp_path / "spec.npz")
        main(["--synth", "4", "--seconds", "1.5", "-o", out, "--cpu",
              "--fir-taps", "256", "--fft", "128", "--fir-method", "direct",
              "--mesh-channel", "1", "--mesh-time", "1"])
        z = np.load(out)
        assert z["spectra"].ndim == 3
