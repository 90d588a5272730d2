"""scipy.signal parity batch 2: window families, firls/minimum_phase,
zi helpers, filtfilt, FFT resample, csd/coherence.

Host-side design functions are checked for near-exactness against scipy
f64; device ops are checked at the SURVEY.md §4 SNR floors.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as ss
import scipy.signal.windows as sw

import llzlab_tpu as lz
from llzlab_tpu.ops import window as lw
from llzlab_tpu.ops import iir as liir
from llzlab_tpu.ops.analysis import coherence, csd
from llzlab_tpu.ops.fir import firls, minimum_phase
from llzlab_tpu.ops.resample import resample


_PLAIN = [
    ("bartlett", lw.bartlett, sw.bartlett),
    ("triang", lw.triang, sw.triang),
    ("blackmanharris", lw.blackmanharris, sw.blackmanharris),
    ("nuttall", lw.nuttall, sw.nuttall),
    ("flattop", lw.flattop, sw.flattop),
    ("bohman", lw.bohman, sw.bohman),
    ("cosine", lw.cosine, sw.cosine),
    ("parzen", lw.parzen, sw.parzen),
    ("barthann", lw.barthann, sw.barthann),
    ("lanczos", lw.lanczos, sw.lanczos),
]


class TestWindows:
    @pytest.mark.parametrize("name,mine,ref", _PLAIN,
                             ids=[c[0] for c in _PLAIN])
    @pytest.mark.parametrize("n", [8, 15, 64, 129])
    @pytest.mark.parametrize("sym", [True, False])
    def test_plain_families(self, name, mine, ref, n, sym):
        np.testing.assert_allclose(
            mine(n, periodic=not sym), ref(n, sym=sym), atol=1e-12)

    @pytest.mark.parametrize("n", [15, 64, 129])
    @pytest.mark.parametrize("sym", [True, False])
    def test_parameterised(self, n, sym):
        np.testing.assert_allclose(
            lw.tukey(n, 0.3, periodic=not sym), sw.tukey(n, 0.3, sym=sym),
            atol=1e-12)
        np.testing.assert_allclose(
            lw.gaussian(n, 7.0, periodic=not sym),
            sw.gaussian(n, 7.0, sym=sym), atol=1e-12)
        np.testing.assert_allclose(
            lw.exponential(n, tau=3.0, periodic=not sym),
            sw.exponential(n, tau=3.0, sym=sym), atol=1e-12)
        np.testing.assert_allclose(
            lw.chebwin(n, 100.0, periodic=not sym),
            sw.chebwin(n, 100, sym=sym), atol=1e-10)
        np.testing.assert_allclose(
            lw.taylor(n, periodic=not sym), sw.taylor(n, sym=sym),
            atol=1e-12)
        np.testing.assert_allclose(
            lw.general_hamming(n, 0.6, periodic=not sym),
            sw.general_hamming(n, 0.6, sym=sym), atol=1e-12)

    def test_get_window_tuples(self):
        np.testing.assert_allclose(
            lw.get_window(("gaussian", 9.0), 64), sw.gaussian(64, 9.0),
            atol=1e-12)
        np.testing.assert_allclose(
            lw.get_window(("chebwin", 80.0), 65), sw.chebwin(65, 80),
            atol=1e-10)
        np.testing.assert_allclose(
            lw.get_window(("tukey", 0.25), 64), sw.tukey(64, 0.25),
            atol=1e-12)
        np.testing.assert_allclose(
            lw.get_window("flattop", 64, periodic=True),
            ss.get_window("flattop", 64), atol=1e-12)
        # scipy positional semantics: a lone parameter is the CENTER,
        # ("exponential", None, tau) selects tau (ADVICE r2).
        np.testing.assert_allclose(
            lw.get_window(("exponential", 10.0), 64, periodic=True),
            ss.get_window(("exponential", 10.0), 64), atol=1e-12)
        np.testing.assert_allclose(
            lw.get_window(("exponential", None, 3.0), 64, periodic=True),
            ss.get_window(("exponential", None, 3.0), 64), atol=1e-12)


class TestFirls:
    @pytest.mark.parametrize("args", [
        (31, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0], None),
        (73, [0, 0.1, 0.15, 0.4, 0.45, 1.0], [1, 1, 0.5, 0.5, 0, 0],
         [1, 2, 10]),
        (11, [0, 0.5, 0.6, 1.0], [1, 0.8, 0, 0], [1, 3]),
    ])
    def test_matches_scipy(self, args):
        n, bands, desired, weight = args
        np.testing.assert_allclose(
            firls(n, bands, desired, weight=weight),
            ss.firls(n, bands, desired, weight=weight), atol=1e-12)

    def test_fs_scaling(self):
        np.testing.assert_allclose(
            firls(41, [0, 4800, 7200, 24000], [1, 1, 0, 0], fs=48000),
            ss.firls(41, [0, 4800, 7200, 24000], [1, 1, 0, 0], fs=48000),
            atol=1e-12)

    def test_even_numtaps_rejected(self):
        with pytest.raises(ValueError):
            firls(30, [0, 0.5, 0.6, 1.0], [1, 1, 0, 0])


class TestMinimumPhase:
    @pytest.mark.parametrize("n", [31, 63, 64, 127])
    def test_matches_scipy(self, n):
        h = ss.firwin(n, 0.3)
        mine = minimum_phase(h)
        ref = ss.minimum_phase(h)
        assert mine.shape == ref.shape
        np.testing.assert_allclose(mine, ref, atol=1e-5)

    def test_magnitude_is_sqrt(self, snr):
        h = ss.firwin(127, 0.4)
        hm = minimum_phase(h)
        w, resp_lin = ss.freqz(h, worN=512)
        _, resp_min = ss.freqz(hm, worN=512)
        # passband magnitudes: |Hmin| == sqrt(|H|) (homomorphic method is
        # ~0.15% accurate here — identical to scipy's own error)
        band = np.abs(w) < 0.3 * np.pi
        np.testing.assert_allclose(
            np.abs(resp_min[band]), np.sqrt(np.abs(resp_lin[band])),
            rtol=5e-3)


class TestZi:
    def test_lfilter_zi(self):
        b, a = ss.butter(5, 0.25)
        np.testing.assert_allclose(
            liir.lfilter_zi(b, a), ss.lfilter_zi(b, a), atol=1e-12)
        b, a = ss.cheby1(3, 1.0, [0.2, 0.6], btype="band")
        np.testing.assert_allclose(
            liir.lfilter_zi(b, a), ss.lfilter_zi(b, a), atol=1e-10)

    def test_sosfilt_zi(self):
        sos = ss.butter(6, [0.2, 0.5], btype="band", output="sos")
        np.testing.assert_allclose(
            liir.sosfilt_zi(sos), ss.sosfilt_zi(sos), atol=1e-12)

    def test_sosfilt_zi_scan_no_transient(self):
        sos = ss.butter(6, [0.2, 0.5], btype="band", output="sos")
        c = 0.7
        x = jnp.full((2, 4096), c, jnp.float32)
        zi = jnp.broadcast_to(
            jnp.asarray(c * liir.sosfilt_zi_scan(sos), jnp.float32),
            (2, sos.shape[0], 2))
        y = np.asarray(liir.sosfilt(sos, x, zi=zi))
        dc = c * np.prod([r[:3].sum() / r[3:].sum() for r in sos])
        assert np.max(np.abs(y - dc)) < 1e-5


class TestFiltfilt:
    def test_sosfiltfilt_matched_padlen(self, snr):
        rng = np.random.default_rng(71)
        x = rng.standard_normal(8192).astype(np.float32)
        for sos in (ss.butter(6, [0.2, 0.5], btype="band", output="sos"),
                    ss.butter(4, 0.2, output="sos")):
            pl = 3 * (2 * len(sos) + 1)
            ref = ss.sosfiltfilt(sos, x.astype(np.float64), padlen=pl)
            mine = np.asarray(lz.sosfiltfilt(sos, jnp.asarray(x), padlen=pl))
            assert snr(ref, mine) >= 110.0

    def test_filtfilt_iir(self, snr):
        rng = np.random.default_rng(72)
        x = rng.standard_normal(8192).astype(np.float32)
        b, a = ss.butter(5, 0.25)
        ref = ss.filtfilt(b, a, x.astype(np.float64), padlen=18)
        mine = np.asarray(lz.filtfilt(b, a, jnp.asarray(x)))
        assert snr(ref, mine) >= 100.0

    def test_filtfilt_fir_one_sample(self):
        """t==1 clamps padlen to 0; must not crash on the empty
        reflection slice (ADVICE r2)."""
        y = np.asarray(lz.filtfilt([0.5, 0.5], [1.0],
                                   jnp.asarray([2.0], jnp.float32)))
        assert y.shape == (1,)
        assert np.isfinite(y).all()

    def test_filtfilt_fir(self, snr):
        rng = np.random.default_rng(73)
        x = rng.standard_normal(8192).astype(np.float32)
        taps = ss.firwin(101, 0.3)
        ref = ss.filtfilt(taps, [1.0], x.astype(np.float64), padlen=303)
        mine = np.asarray(lz.filtfilt(taps, [1.0], jnp.asarray(x)))
        assert snr(ref, mine) >= 110.0


class TestFFTResample:
    @pytest.mark.parametrize("num", [500, 735, 1000, 1024, 2001, 999])
    def test_matches_scipy(self, num, snr):
        rng = np.random.default_rng(74)
        x = rng.standard_normal((2, 1000)).astype(np.float32)
        ref = ss.resample(x.astype(np.float64), num, axis=-1)
        mine = np.asarray(resample(jnp.asarray(x), num))
        assert mine.shape == ref.shape
        assert snr(ref, mine) >= 110.0

    @pytest.mark.parametrize("win", ["hamming", ("kaiser", 5.0)])
    def test_windowed(self, win, snr):
        rng = np.random.default_rng(75)
        x = rng.standard_normal((2, 1000)).astype(np.float32)
        ref = ss.resample(x.astype(np.float64), 500, axis=-1, window=win)
        mine = np.asarray(resample(jnp.asarray(x), 500, window=win))
        assert snr(ref, mine) >= 110.0


class TestCrossSpectral:
    def _xy(self):
        rng = np.random.default_rng(76)
        n = 8192
        x = rng.standard_normal(n).astype(np.float32)
        y = (ss.lfilter([0.5, 0.3], [1.0], x)
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        return x, y

    def test_csd(self, snr):
        x, y = self._xy()
        f1, p1 = csd(jnp.asarray(x), jnp.asarray(y), fs=2.0, nperseg=256)
        f2, p2 = ss.csd(x.astype(np.float64), y.astype(np.float64),
                        fs=2.0, nperseg=256)
        np.testing.assert_allclose(f1, f2)
        p1 = np.asarray(p1)
        err = p2 - p1
        s = 10 * np.log10(np.sum(np.abs(p2) ** 2) / np.sum(np.abs(err) ** 2))
        assert s >= 110.0

    def test_csd_unequal_lengths(self, snr):
        """scipy zero-pads the shorter input; we must match (ADVICE r2)."""
        x, y = self._xy()
        y = y[:6000]
        f1, p1 = csd(jnp.asarray(x), jnp.asarray(y), fs=2.0, nperseg=256)
        f2, p2 = ss.csd(x.astype(np.float64), y.astype(np.float64),
                        fs=2.0, nperseg=256)
        np.testing.assert_allclose(f1, f2)
        err = p2 - np.asarray(p1)
        s = 10 * np.log10(np.sum(np.abs(p2) ** 2) / np.sum(np.abs(err) ** 2))
        assert s >= 110.0
        # and the flipped order (x shorter)
        f3, p3 = coherence(jnp.asarray(y), jnp.asarray(x), fs=2.0,
                           nperseg=256)
        _, c2 = ss.coherence(y.astype(np.float64), x.astype(np.float64),
                             fs=2.0, nperseg=256)
        assert snr(c2, np.asarray(p3)) >= 100.0

    def test_coherence(self, snr):
        x, y = self._xy()
        f1, c1 = coherence(jnp.asarray(x), jnp.asarray(y), fs=2.0,
                           nperseg=256)
        f2, c2 = ss.coherence(x.astype(np.float64), y.astype(np.float64),
                              fs=2.0, nperseg=256)
        np.testing.assert_allclose(f1, f2)
        assert snr(c2, np.asarray(c1)) >= 100.0
        # coherent-plus-noise channel: mid coherence high, never > 1
        c1 = np.asarray(c1)
        assert np.all(c1 <= 1.0 + 1e-6)
        assert np.median(c1) > 0.8
