"""Extra lab utilities: fftconvolve, filtfilt, decimate, analysis ops."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as ss

import llzlab_tpu as lz
from llzlab_tpu.ops.analysis import freqz, group_delay, sosfreqz, spectrogram
from llzlab_tpu.ops import analysis as lza
from llzlab_tpu.ops.convolve import correlate, fftconvolve
from llzlab_tpu.ops.iir import sosfiltfilt
from llzlab_tpu.ops.resample import decimate


class TestConvolve:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_matches_numpy(self, mode, snr):
        rng = np.random.default_rng(161)
        a = rng.standard_normal(1000).astype(np.float32)
        b = rng.standard_normal(128).astype(np.float32)
        ours = np.asarray(fftconvolve(a, b, mode=mode))
        ref = np.convolve(a.astype(np.float64), b.astype(np.float64), mode)
        assert ours.shape == ref.shape
        assert snr(ref, ours) >= 110.0

    def test_batched(self, snr):
        rng = np.random.default_rng(162)
        a = rng.standard_normal((4, 512)).astype(np.float32)
        b = rng.standard_normal((4, 64)).astype(np.float32)
        ours = np.asarray(fftconvolve(a, b))
        for i in range(4):
            ref = np.convolve(a[i].astype(np.float64), b[i].astype(np.float64))
            assert snr(ref, ours[i]) >= 110.0

    def test_correlate(self, snr):
        rng = np.random.default_rng(163)
        a = rng.standard_normal(300).astype(np.float32)
        b = rng.standard_normal(50).astype(np.float32)
        ours = np.asarray(correlate(a, b))
        ref = np.correlate(a.astype(np.float64), b.astype(np.float64), "full")
        assert snr(ref, ours) >= 110.0


class TestFiltfilt:
    def test_zero_phase(self, snr):
        """filtfilt of a band-limited signal has no delay: correlation
        peak of in/out sits at lag 0."""
        rng = np.random.default_rng(164)
        sos = lz.butter_sos(4, 0.3)
        x = rng.standard_normal(8192).astype(np.float32)
        y = np.asarray(sosfiltfilt(sos, x, block_size=1024))
        ref = ss.sosfiltfilt(sos, x.astype(np.float64))
        assert snr(ref[200:-200], y[200:-200]) >= 60.0  # padding differs

    def test_magnitude_squared(self):
        """A tone in the passband keeps amplitude; filtfilt applies |H|²."""
        sos = lz.butter_sos(4, 0.5)
        t = np.arange(8192) / 48000
        x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
        y = np.asarray(sosfiltfilt(sos, x))
        rms_ratio = np.sqrt(np.mean(y[1000:-1000] ** 2) /
                            np.mean(x[1000:-1000] ** 2))
        assert abs(rms_ratio - 1.0) < 1e-3


class TestDecimate:
    def test_rate_and_alias(self):
        fs = 48000.0
        t = np.arange(48000) / fs
        x = (np.sin(2 * np.pi * 1000 * t) +
             np.sin(2 * np.pi * 20000 * t)).astype(np.float32)
        y = np.asarray(decimate(x, 4))  # → 12 kHz, Nyquist 6 kHz
        assert y.shape[-1] == 12000
        spec = np.abs(np.fft.rfft(y[2000:10000].astype(np.float64)))
        freqs = np.fft.rfftfreq(8000, 1 / 12000)
        tone = spec[np.argmin(np.abs(freqs - 1000))]
        # 20 kHz folds to 4 kHz w/o filtering — must be attenuated ≥60 dB
        alias = spec[np.argmin(np.abs(freqs - 4000))]
        assert 20 * np.log10(alias / tone) < -60.0


class TestAnalysis:
    def test_freqz_matches_scipy(self):
        taps = lz.firwin(101, 0.3)
        w0, h0 = ss.freqz(taps, worN=256)
        w1, h1 = freqz(taps, worN=256)
        np.testing.assert_allclose(h0, h1, atol=1e-12)

    def test_sosfreqz_matches_scipy(self):
        sos = lz.butter_sos(6, 0.4)
        w0, h0 = ss.sosfreqz(sos, worN=256)
        w1, h1 = sosfreqz(sos, worN=256)
        np.testing.assert_allclose(h0, h1, atol=1e-10)

    def test_group_delay_linear_phase(self):
        taps = lz.firwin(101, 0.3)  # linear phase: gd = (N-1)/2 = 50
        w, gd = group_delay(taps, worN=512)
        band = (w > 0.05 * np.pi) & (w < 0.25 * np.pi)
        np.testing.assert_allclose(gd[band], 50.0, atol=0.1)

    def test_spectrogram_tone(self):
        fs, n_fft = 48000.0, 1024
        k = 64
        t = np.arange(48000) / fs
        x = np.sin(2 * np.pi * (k * fs / n_fft) * t).astype(np.float32)
        S = np.asarray(spectrogram(x, n_fft=n_fft))
        assert np.argmax(S.mean(axis=0)) == k


class TestLfilter:
    def test_tf2sos_response(self):
        b, a = ss.butter(6, 0.3)
        from llzlab_tpu.ops.iir import tf2sos
        w0, h0 = ss.freqz(b, a, worN=512)
        w1, h1 = ss.sosfreqz(tf2sos(b, a), worN=512)
        np.testing.assert_allclose(h0, h1, atol=1e-10)

    def test_tf2sos_delay_numerator(self):
        from llzlab_tpu.ops.iir import tf2sos
        b = np.array([0.0, 0.5, 0.25])
        a = np.array([1.0, -0.5, 0.2])
        w0, h0 = ss.freqz(b, a, worN=512)
        w1, h1 = ss.sosfreqz(tf2sos(b, a), worN=512)
        np.testing.assert_allclose(h0, h1, atol=1e-12)

    def test_lfilter_iir(self, snr):
        from llzlab_tpu.ops.iir import lfilter
        rng = np.random.default_rng(165)
        x = rng.standard_normal(16384).astype(np.float32)
        b, a = ss.butter(4, 0.25)
        ref = ss.lfilter(b, a, x.astype(np.float64))
        assert snr(ref, np.asarray(lfilter(b, a, x))) >= 110.0

    def test_lfilter_fir_dispatch(self, snr):
        from llzlab_tpu.ops.iir import lfilter
        rng = np.random.default_rng(166)
        x = rng.standard_normal(8192).astype(np.float32)
        taps = ss.firwin(64, 0.3)
        ref = ss.lfilter(taps, [1.0], x.astype(np.float64))
        assert snr(ref, np.asarray(lfilter(taps, [1.0], x))) >= 110.0


class TestPsdAndHilbert:
    """hilbert / periodogram / welch vs scipy (ops/analysis.py)."""

    def test_hilbert_matches_scipy(self, snr):
        rng = np.random.default_rng(21)
        x = rng.standard_normal(4096).astype(np.float32)
        a = np.asarray(lza.hilbert(x))
        b = ss.hilbert(x.astype(np.float64))
        assert snr(b, a) >= 100.0
        np.testing.assert_allclose(a.real, x, atol=1e-3)

    def test_periodogram_matches_scipy(self, snr):
        rng = np.random.default_rng(22)
        x = rng.standard_normal(2048).astype(np.float32)
        f1, p1 = lza.periodogram(x, fs=48000.0)
        f2, p2 = ss.periodogram(x.astype(np.float64), fs=48000.0)
        np.testing.assert_allclose(f1, f2)
        assert snr(p2, np.asarray(p1)) >= 90.0

    def test_welch_matches_scipy(self, snr):
        rng = np.random.default_rng(23)
        x = rng.standard_normal((3, 4096)).astype(np.float32)
        f1, p1 = lza.welch(x, fs=48000.0, nperseg=256)
        f2, p2 = ss.welch(x.astype(np.float64), fs=48000.0, nperseg=256)
        np.testing.assert_allclose(f1, f2)
        assert snr(p2, np.asarray(p1)) >= 90.0
