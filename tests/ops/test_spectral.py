"""STFT/iSTFT framing, COLA reconstruction, spectral gain (BASELINE.json:10)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as ss

import llzlab_tpu as lz
from llzlab_tpu.ops import spectral as sp


class TestFraming:
    def test_frame_values(self):
        x = np.arange(40, dtype=np.float32)
        f = np.asarray(sp.frame(jnp.asarray(x), n_fft=16, hop=4))
        assert f.shape == (7, 16)
        for i in range(7):
            np.testing.assert_array_equal(f[i], x[i * 4 : i * 4 + 16])

    def test_overlap_add_inverts_frame_sum(self):
        rng = np.random.default_rng(41)
        frames = rng.standard_normal((5, 16)).astype(np.float32)
        y = np.asarray(sp.overlap_add(jnp.asarray(frames), hop=4))
        ref = np.zeros(16 + 4 * 4)
        for i in range(5):
            ref[i * 4 : i * 4 + 16] += frames[i]
        np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)

    def test_hop_must_divide(self):
        with pytest.raises(ValueError):
            sp.frame(jnp.zeros(100), n_fft=16, hop=5)


class TestSTFT:
    """Config 4 (BASELINE.json:10): 2048-pt FFT, 75% overlap."""

    def test_matches_scipy_stft_frames(self, snr):
        rng = np.random.default_rng(42)
        x = rng.standard_normal(2048 * 8).astype(np.float32)
        ours = np.asarray(lz.stft(x, n_fft=2048, hop=512))
        w = lz.get_window("hann", 2048, periodic=True)
        # manual golden
        nf = ours.shape[0]
        for i in (0, nf // 2, nf - 1):
            frame = x[i * 512 : i * 512 + 2048].astype(np.float64) * w
            ref = np.fft.rfft(frame)
            assert snr(ref, ours[i]) >= 110.0

    def test_roundtrip_perfect_reconstruction(self, snr):
        rng = np.random.default_rng(43)
        x = rng.standard_normal((3, 2048 * 16)).astype(np.float32)
        y = np.asarray(lz.istft(lz.stft(x), length=x.shape[-1]))
        e = 2048
        assert snr(x[:, e:-e], y[:, e:-e]) >= 130.0

    def test_unity_gain_chain(self, snr):
        """STFT → gain 1.0 → iSTFT == identity in the interior."""
        rng = np.random.default_rng(44)
        x = rng.standard_normal(48128).astype(np.float32)
        spec = lz.stft(x)
        y = np.asarray(lz.istft(spec * 1.0, length=len(x)))
        assert snr(x[2048:-2048], y[2048:-2048]) >= 130.0

    def test_spectral_gain_attenuates_band(self):
        """A −∞ dB notch over bins 100–200 removes a tone in that band."""
        fs = 48000.0
        n_fft, hop = 2048, 512
        k_tone = 150
        f_tone = k_tone * fs / n_fft
        t = np.arange(48128) / fs
        x = np.sin(2 * np.pi * f_tone * t).astype(np.float32)
        gain = np.ones(n_fft // 2 + 1, np.float32)
        gain[100:200] = 0.0
        spec = lz.stft(x, n_fft=n_fft, hop=hop)
        y = np.asarray(lz.istft(spec * gain, n_fft=n_fft, hop=hop, length=len(x)))
        rms_in = np.sqrt(np.mean(x[4096:-4096] ** 2))
        rms_out = np.sqrt(np.mean(y[4096:-4096] ** 2))
        assert 20 * np.log10(rms_out / rms_in + 1e-12) < -60.0

    def test_256_channels_shape(self):
        rng = np.random.default_rng(45)
        x = rng.standard_normal((256, 8192)).astype(np.float32)
        spec = lz.stft(x)
        nf = sp.stft_num_frames(8192, 2048, 512)
        assert spec.shape == (256, nf, 1025)
        y = np.asarray(lz.istft(spec, length=8192))
        assert y.shape == (256, 8192)
