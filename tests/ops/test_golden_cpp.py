"""C++ scalar golden runner vs scipy and vs our ops (SURVEY.md §4.1)."""

import numpy as np
import pytest
import scipy.signal as ss

import llzlab_tpu as lz
from llzlab_tpu import golden


pytestmark = pytest.mark.skipif(
    not golden.available(), reason="golden lib failed to build"
)


class TestGoldenVsScipy:
    def test_fft(self, snr):
        rng = np.random.default_rng(81)
        z = rng.standard_normal(2048) + 1j * rng.standard_normal(2048)
        assert snr(np.fft.fft(z), golden.fft(z)) >= 200.0

    def test_ifft_roundtrip(self, snr):
        rng = np.random.default_rng(82)
        z = rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
        assert snr(z, golden.fft(golden.fft(z), inverse=True)) >= 200.0

    def test_fir(self, snr):
        rng = np.random.default_rng(83)
        taps = lz.firwin(1024, 0.25)
        x = rng.standard_normal(20000).astype(np.float32)
        ref = ss.lfilter(taps, [1.0], x.astype(np.float64))
        assert snr(ref, golden.fir(x, taps)) >= 250.0

    def test_sosfilt(self, snr):
        rng = np.random.default_rng(84)
        sos = lz.peaking_eq_sos([200, 2000, 8000], [4, -5, 3], 48000.0)
        x = rng.standard_normal(20000).astype(np.float32)
        ref = ss.sosfilt(sos, x.astype(np.float64))
        assert snr(ref, golden.sosfilt(sos, x)) >= 250.0

    def test_upfirdn(self, snr):
        rng = np.random.default_rng(85)
        h = lz.resample_taps(147, 160, 64)
        x = rng.standard_normal(16000).astype(np.float32)
        ours = golden.upfirdn(h, x, 147, 160)
        ref = ss.upfirdn(h, x.astype(np.float64), 147, 160)[: ours.size]
        assert snr(ref, ours) >= 250.0

    def test_rfft_windowed(self, snr):
        rng = np.random.default_rng(86)
        x = rng.standard_normal(2048).astype(np.float32)
        w = lz.get_window("hann", 2048, periodic=True)
        ref = np.fft.rfft(x.astype(np.float64) * w)
        assert snr(ref, golden.rfft(x, w)) >= 200.0


class TestOpsVsGolden:
    """The acceptance check: TPU-path ops ≥80 dB vs the C++ serial golden
    on the BASELINE configs (BASELINE.json:5)."""

    def test_fir_config1(self, snr):
        rng = np.random.default_rng(87)
        taps = lz.firwin(1024, 0.25)
        x = rng.standard_normal(48000).astype(np.float32)
        ref = golden.fir(x, taps)
        assert snr(ref, np.asarray(lz.fir_filter(x, taps, method="ols"))) >= 80.0

    def test_iir_config3(self, snr):
        rng = np.random.default_rng(88)
        sos = lz.peaking_eq_sos(
            [100, 200, 400, 800, 1600, 3200, 6400, 12800],
            [3, -4, 5, -2, 6, -3, 2, -5], 48000.0,
        )
        x = rng.standard_normal(48000).astype(np.float32)
        ref = golden.sosfilt(sos, x)
        assert snr(ref, np.asarray(lz.sosfilt(sos, x))) >= 80.0

    def test_resample_config2(self, snr):
        rng = np.random.default_rng(89)
        h = lz.resample_taps(147, 160, 64)
        x = rng.standard_normal(48000).astype(np.float32)
        ref = golden.upfirdn(h, x, 147, 160)
        ours = np.asarray(lz.resample_poly(x, 147, 160, taps=h))
        assert snr(ref[: ours.size], ours) >= 80.0
