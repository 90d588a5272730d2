"""FIR design + filtering vs scipy goldens (SURVEY.md §4.2; BASELINE.json:7)."""

import numpy as np
import pytest
import scipy.signal as ss

import llzlab_tpu as lz
from llzlab_tpu.ops import fir as fir_mod


class TestFirwin:
    def test_lowpass_matches_scipy(self):
        ours = lz.firwin(1024, 0.25, window="hamming")
        ref = ss.firwin(1024, 0.25, window="hamming")
        np.testing.assert_allclose(ours, ref, atol=1e-14)

    def test_kaiser_matches_scipy(self):
        ours = lz.firwin(101, 0.3, window=("kaiser", 8.0))
        ref = ss.firwin(101, 0.3, window=("kaiser", 8.0))
        np.testing.assert_allclose(ours, ref, atol=1e-14)

    def test_highpass_matches_scipy(self):
        ours = lz.firwin(255, 0.4, window="blackman", pass_zero=False)
        ref = ss.firwin(255, 0.4, window="blackman", pass_zero=False)
        np.testing.assert_allclose(ours, ref, atol=1e-14)

    def test_bandpass_matches_scipy(self):
        ours = lz.firwin(129, [0.2, 0.5], window="hann", pass_zero=False)
        ref = ss.firwin(129, [0.2, 0.5], window="hann", pass_zero=False)
        np.testing.assert_allclose(ours, ref, atol=1e-14)

    def test_bandstop_matches_scipy(self):
        ours = lz.firwin(129, [0.2, 0.5], window="hamming", pass_zero=True)
        ref = ss.firwin(129, [0.2, 0.5], window="hamming", pass_zero=True)
        np.testing.assert_allclose(ours, ref, atol=1e-14)

    def test_even_taps_nyquist_raises(self):
        with pytest.raises(ValueError):
            lz.firwin(128, 0.4, pass_zero=False)  # highpass, even taps


class TestFirFilter:
    """Config 1 (BASELINE.json:7): 1024-tap lowpass on 48 kHz noise+tones."""

    @pytest.fixture(scope="class")
    def signal(self):
        rng = np.random.default_rng(7)
        t = np.arange(48000 * 2) / 48000.0
        x = rng.standard_normal(len(t)) + np.sin(2 * np.pi * 1000 * t)
        return x.astype(np.float32)

    @pytest.fixture(scope="class")
    def taps(self):
        return lz.firwin(1024, 0.25, window="hamming")

    @pytest.mark.parametrize("method", ["ols", "direct"])
    def test_snr_vs_golden(self, signal, taps, method, snr):
        ref = ss.lfilter(taps, [1.0], signal.astype(np.float64))
        y = np.asarray(lz.fir_filter(signal, taps, method=method))
        assert snr(ref, y) >= 80.0  # BASELINE.json:5 bound; typically >130

    def test_ols_equals_direct(self, signal, taps, snr):
        y1 = np.asarray(lz.fir_filter(signal, taps, method="ols"))
        y2 = np.asarray(lz.fir_filter(signal, taps, method="direct"))
        assert snr(y1, y2) >= 120.0

    def test_streaming_bit_exact_at_hop(self, signal, taps):
        hop = fir_mod.ols_hop(1024, fir_mod.default_nfft(1024))
        split = hop * 7
        ya, zf = lz.fir_filter(signal[:split], taps, method="ols", return_zf=True)
        yb = lz.fir_filter(signal[split:], taps, method="ols", zi=zf)
        y_cat = np.concatenate([np.asarray(ya), np.asarray(yb)])
        y_full = np.asarray(lz.fir_filter(signal, taps, method="ols"))
        np.testing.assert_array_equal(y_cat, y_full)

    def test_streaming_any_split(self, signal, taps, snr):
        split = 10007  # not a hop multiple
        ya, zf = lz.fir_filter(signal[:split], taps, method="ols", return_zf=True)
        yb = lz.fir_filter(signal[split:], taps, method="ols", zi=zf)
        y_cat = np.concatenate([np.asarray(ya), np.asarray(yb)])
        y_full = np.asarray(lz.fir_filter(signal, taps, method="ols"))
        assert snr(y_full, y_cat) >= 130.0

    def test_multichannel_vmap_semantics(self, taps, snr):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((4, 3, 20000)).astype(np.float32)
        y = np.asarray(lz.fir_filter(x, taps))
        for i in range(4):
            for j in range(3):
                ref = ss.lfilter(taps, [1.0], x[i, j].astype(np.float64))
                assert snr(ref, y[i, j]) >= 80.0

    def test_impulse_recovers_taps(self, taps):
        x = np.zeros(4096, np.float32)
        x[0] = 1.0
        y = np.asarray(lz.fir_filter(x, taps, method="ols"))
        np.testing.assert_allclose(y[:1024], taps.astype(np.float32), atol=2e-6)

    def test_linearity(self, signal, taps):
        a = np.asarray(lz.fir_filter(signal, taps))
        b = np.asarray(lz.fir_filter(2.0 * signal, taps))
        np.testing.assert_allclose(2.0 * a, b, rtol=1e-4, atol=1e-4)

    def test_time_invariance(self, taps, snr):
        rng = np.random.default_rng(5)
        x = rng.standard_normal(20000).astype(np.float32)
        shift = 1536
        xs = np.concatenate([np.zeros(shift, np.float32), x])
        y = np.asarray(lz.fir_filter(x, taps))
        ys = np.asarray(lz.fir_filter(xs, taps))
        assert snr(y, ys[shift:]) >= 120.0


class TestFirFused:
    """Fused spectral-matmul OLS engine (ops/ols_matmul.py) vs goldens."""

    @pytest.fixture(scope="class")
    def taps(self):
        return lz.firwin(1024, 0.25, window="hamming")

    @pytest.mark.parametrize("nfft", [4096, 8192, 16384])
    def test_snr_vs_scipy(self, taps, nfft, snr):
        rng = np.random.default_rng(11)
        x = rng.standard_normal((3, 50000)).astype(np.float32)
        y = np.asarray(
            lz.fir_filter(x, taps, method="ols", nfft=nfft, spectral="fused")
        )
        for i in range(3):
            ref = ss.lfilter(taps, [1.0], x[i].astype(np.float64))
            assert snr(ref, y[i]) >= 80.0  # typically >130

    def test_matches_fft_engine(self, taps, snr):
        rng = np.random.default_rng(12)
        x = rng.standard_normal(30000).astype(np.float32)
        a = np.asarray(lz.fir_filter(x, taps, method="ols", spectral="fused"))
        b = np.asarray(lz.fir_filter(x, taps, method="ols", spectral="fft"))
        assert snr(b, a) >= 120.0

    def test_streaming_split_invariance(self, taps, snr):
        # The fused engine's per-frame math runs through batched matmuls
        # whose accumulation can differ at the last ulp when the batch
        # shape changes (CPU GEMM blocking), so the streaming invariant is
        # ≥130 dB rather than the fft engine's bit-exactness.
        rng = np.random.default_rng(13)
        hop = fir_mod.ols_hop(1024, 4096)
        x = rng.standard_normal(9 * hop).astype(np.float32)
        full = np.asarray(
            lz.fir_filter(x, taps, method="ols", spectral="fused")
        )
        ya, zf = lz.fir_filter(
            x[: 4 * hop], taps, method="ols", spectral="fused", return_zf=True
        )
        yb = lz.fir_filter(
            x[4 * hop :], taps, method="ols", spectral="fused", zi=zf
        )
        cat = np.concatenate([np.asarray(ya), np.asarray(yb)])
        assert snr(full, cat) >= 130.0

    def test_short_filter_small_nfft(self, snr):
        taps = lz.firwin(31, 0.3)
        rng = np.random.default_rng(14)
        x = rng.standard_normal(5000).astype(np.float32)
        y = np.asarray(
            lz.fir_filter(x, taps, method="ols", nfft=128, spectral="fused")
        )
        ref = ss.lfilter(taps, [1.0], x.astype(np.float64))
        assert snr(ref, y) >= 80.0

    def test_odd_length_tail(self, taps, snr):
        rng = np.random.default_rng(15)
        x = rng.standard_normal(10007).astype(np.float32)
        y = np.asarray(lz.fir_filter(x, taps, method="ols", spectral="fused"))
        ref = ss.lfilter(taps, [1.0], x.astype(np.float64))
        assert snr(ref, y) >= 80.0
