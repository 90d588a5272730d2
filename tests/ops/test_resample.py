"""Polyphase resampler vs scipy.upfirdn (SURVEY.md §4.2; BASELINE.json:8)."""

import numpy as np
import pytest
import scipy.signal as ss

import llzlab_tpu as lz
from llzlab_tpu.ops import resample as rs_mod


class TestResample:
    """Config 2 (BASELINE.json:8): 48k→44.1k = 147/160, 64 taps/phase, 8 ch."""

    @pytest.fixture(scope="class")
    def taps(self):
        return lz.resample_taps(147, 160, 64)

    def test_output_rate(self, taps):
        x = np.zeros(48000, np.float32)
        y = lz.resample_poly(x, 147, 160, taps=taps)
        assert y.shape[-1] == 44100

    def test_matches_upfirdn(self, taps, snr):
        rng = np.random.default_rng(21)
        x = rng.standard_normal((8, 48000)).astype(np.float32)
        y = np.asarray(lz.resample_poly(x, 147, 160, taps=taps))
        for i in range(8):
            ref = ss.upfirdn(taps, x[i].astype(np.float64), 147, 160)
            assert snr(ref[: y.shape[-1]], y[i]) >= 120.0

    def test_gcd_reduction(self, taps, snr):
        rng = np.random.default_rng(22)
        x = rng.standard_normal(48000).astype(np.float32)
        y1 = np.asarray(lz.resample_poly(x, 147, 160, taps=taps))
        y2 = np.asarray(lz.resample_poly(x, 294, 320, taps=taps))
        np.testing.assert_array_equal(y1, y2)

    def test_streaming_bit_exact(self, taps):
        rng = np.random.default_rng(23)
        x = rng.standard_normal((4, 64000)).astype(np.float32)
        y_full = np.asarray(lz.resample_poly(x, 147, 160, taps=taps))
        split = 160 * 150  # multiple of down
        ya, zf = lz.resample_poly(x[:, :split], 147, 160, taps=taps, return_zf=True)
        yb = lz.resample_poly(x[:, split:], 147, 160, taps=taps, zi=zf)
        y_cat = np.concatenate([np.asarray(ya), np.asarray(yb)], axis=-1)
        np.testing.assert_array_equal(y_cat, y_full)

    def test_passband_tone_preserved(self, taps, snr):
        """10 kHz tone resampled 48k→44.1k: compare vs f64 upfirdn."""
        t = np.arange(48000) / 48000.0
        x = np.sin(2 * np.pi * 10000 * t).astype(np.float32)
        y = np.asarray(lz.resample_poly(x, 147, 160, taps=taps))
        ref = ss.upfirdn(taps, x.astype(np.float64), 147, 160)[: y.shape[-1]]
        assert snr(ref, y) >= 110.0

    def test_alias_rejection(self, taps):
        """A tone above the target Nyquist and past the filter transition
        band (23.5 kHz > 22.05 kHz + ~1 kHz transition for 64 taps/phase)
        must be attenuated by the polyphase lowpass, not folded in."""
        t = np.arange(48000) / 48000.0
        x = np.sin(2 * np.pi * 23500 * t).astype(np.float32)
        y = np.asarray(lz.resample_poly(x, 147, 160, taps=taps)).astype(np.float64)
        in_rms = np.sqrt(np.mean(x[8000:-8000].astype(np.float64) ** 2))
        out_rms = np.sqrt(np.mean(y[8000:-8000] ** 2))
        assert 20 * np.log10(out_rms / in_rms) < -60.0

    def test_upsample_2x(self, snr):
        rng = np.random.default_rng(24)
        taps = lz.resample_taps(2, 1, 32)
        x = rng.standard_normal(10000).astype(np.float32)
        y = np.asarray(lz.resample_poly(x, 2, 1, taps=taps))
        ref = ss.upfirdn(taps, x.astype(np.float64), 2, 1)[: y.shape[-1]]
        assert y.shape[-1] == 20000
        assert snr(ref, y) >= 120.0

    def test_downsample_3x(self, snr):
        rng = np.random.default_rng(25)
        taps = lz.resample_taps(1, 3, 48)
        x = rng.standard_normal(30000).astype(np.float32)
        y = np.asarray(lz.resample_poly(x, 1, 3, taps=taps))
        ref = ss.upfirdn(taps, x.astype(np.float64), 1, 3)[: y.shape[-1]]
        assert y.shape[-1] == 10000
        assert snr(ref, y) >= 120.0

    def test_identity(self):
        x = np.arange(100, dtype=np.float32)
        y = np.asarray(lz.resample_poly(x, 5, 5))
        np.testing.assert_array_equal(x, y)

    def test_output_len_helper(self):
        assert rs_mod.resample_output_len(48000, 147, 160) == 44100
        assert rs_mod.resample_output_len(100, 2, 1) == 200
        assert rs_mod.resample_output_len(101, 1, 3) == 34
