"""Smoothing family (savgol/medfilt/wiener/detrend) and CZT/zoom-FFT/
Fourier-resample vs scipy goldens (SURVEY.md §4.2 pattern)."""

import numpy as np
import pytest
import scipy.signal as ss

import jax.numpy as jnp

from llzlab_tpu.ops import smooth
from llzlab_tpu.ops import chirpz as czt_mod


@pytest.fixture(scope="module")
def x():
    return np.random.default_rng(3).standard_normal((3, 500)).astype(
        np.float32
    )


class TestSmoothing:
    @pytest.mark.parametrize("kind", ["constant", "linear"])
    def test_detrend(self, snr, x, kind):
        ref = ss.detrend(x.astype(np.float64), type=kind)
        assert snr(ref, smooth.detrend(jnp.asarray(x), type=kind)) >= 120

    @pytest.mark.parametrize(
        "wl,po,d", [(11, 3, 0), (21, 4, 0), (15, 3, 1), (10, 2, 0)]
    )
    def test_savgol_coeffs_exact(self, wl, po, d):
        ref = ss.savgol_coeffs(wl, po, deriv=d)
        np.testing.assert_allclose(
            smooth.savgol_coeffs(wl, po, deriv=d), ref, atol=1e-12
        )

    @pytest.mark.parametrize(
        "mode", ["interp", "nearest", "mirror", "constant", "wrap"]
    )
    def test_savgol_filter(self, snr, x, mode):
        ref = ss.savgol_filter(x.astype(np.float64), 11, 3, mode=mode)
        y = smooth.savgol_filter(jnp.asarray(x), 11, 3, mode=mode)
        assert snr(ref, y) >= 100

    def test_savgol_deriv(self, snr, x):
        ref = ss.savgol_filter(
            x.astype(np.float64), 15, 4, deriv=2, delta=0.5, mode="interp"
        )
        y = smooth.savgol_filter(jnp.asarray(x), 15, 4, deriv=2, delta=0.5)
        assert snr(ref, y) >= 100

    @pytest.mark.parametrize("k", [3, 5, 9])
    def test_medfilt(self, x, k):
        ref = np.stack([ss.medfilt(r, k) for r in x.astype(np.float64)])
        np.testing.assert_allclose(
            np.asarray(smooth.medfilt(jnp.asarray(x), k)), ref, atol=1e-6
        )

    @pytest.mark.parametrize("k,noise", [(3, None), (7, None), (5, 0.1)])
    def test_wiener(self, snr, x, k, noise):
        ref = np.stack(
            [ss.wiener(r, k, noise) for r in x.astype(np.float64)]
        )
        assert snr(ref, smooth.wiener(jnp.asarray(x), k, noise)) >= 100


class TestCZT:
    def test_czt_is_dft_by_default(self, snr, x):
        ref = ss.czt(x[0].astype(np.float64))
        y = np.asarray(czt_mod.czt(jnp.asarray(x[0])))
        assert snr(ref.real, y.real) >= 100
        assert snr(ref.imag, y.imag) >= 100

    def test_czt_spiral(self, snr, x):
        w = np.exp(-2j * np.pi * 0.001)
        a = np.exp(2j * np.pi * 0.05)
        ref = ss.czt(x[0].astype(np.float64), 100, w, a)
        y = np.asarray(czt_mod.czt(jnp.asarray(x[0]), 100, w, a))
        assert snr(ref.real, y.real) >= 100
        assert snr(ref.imag, y.imag) >= 100

    def test_zoom_fft(self, snr, x):
        ref = ss.zoom_fft(x[0].astype(np.float64), [0.1, 0.3], m=200, fs=2.0)
        y = np.asarray(
            czt_mod.zoom_fft(jnp.asarray(x[0]), [0.1, 0.3], 200, fs=2.0)
        )
        assert snr(ref.real, y.real) >= 100
        assert snr(ref.imag, y.imag) >= 100

    @pytest.mark.parametrize("num", [250, 256, 1000, 333, 501])
    def test_resample_fourier(self, snr, x, num):
        ref = ss.resample(x.astype(np.float64), num, axis=-1)
        y = czt_mod.resample_fourier(jnp.asarray(x), num)
        assert y.shape == (x.shape[0], num)
        assert snr(ref, y) >= 100
