"""scipy.signal-compatible front doors (ops/compat.py) vs scipy itself.

Design functions are compared by FREQUENCY RESPONSE (section pairing
and root ordering legitimately differ); utilities are compared
value-for-value.
"""

import numpy as np
import pytest
import scipy.signal as ss

from llzlab_tpu.ops import compat as c


def _resp_ba(b, a, n=512):
    w, h = ss.freqz(b, a, worN=n)
    return h


def _resp_sos(sos, n=512):
    w, h = ss.sosfreqz(np.asarray(sos), worN=n)
    return h


def _match(h1, h2, db=100.0):
    err = np.abs(h1 - h2)
    ref = np.abs(h1)
    snr = 10 * np.log10((ref**2).sum() / max((err**2).sum(), 1e-300))
    assert snr >= db, snr


class TestDesigners:
    @pytest.mark.parametrize("btype,wn", [
        ("low", 0.3), ("high", 0.4), ("bandpass", [0.2, 0.5]),
        ("bandstop", [0.25, 0.6]),
    ])
    def test_butter_ba(self, btype, wn):
        b, a = c.butter(5, wn, btype=btype)
        bs, as_ = ss.butter(5, wn, btype=btype)
        _match(_resp_ba(bs, as_), _resp_ba(b, a))

    def test_butter_fs_and_sos(self):
        sos = c.butter(6, 4000.0, fs=48000.0, output="sos")
        sos_s = ss.butter(6, 4000.0, fs=48000.0, output="sos")
        _match(_resp_sos(sos_s), _resp_sos(sos))

    def test_butter_zpk(self):
        z, p, k = c.butter(4, 0.3, output="zpk")
        zs, ps, ks = ss.butter(4, 0.3, output="zpk")
        assert np.allclose(sorted(np.abs(p)), sorted(np.abs(ps)))
        assert np.isclose(k, ks, rtol=1e-9)

    def test_cheby1(self):
        b, a = c.cheby1(5, 1.0, 0.3)
        bs, as_ = ss.cheby1(5, 1.0, 0.3)
        _match(_resp_ba(bs, as_), _resp_ba(b, a))

    def test_cheby2(self):
        b, a = c.cheby2(5, 40.0, 0.4)
        bs, as_ = ss.cheby2(5, 40.0, 0.4)
        _match(_resp_ba(bs, as_), _resp_ba(b, a))

    def test_ellip(self):
        b, a = c.ellip(4, 1.0, 40.0, 0.35)
        bs, as_ = ss.ellip(4, 1.0, 40.0, 0.35)
        _match(_resp_ba(bs, as_), _resp_ba(b, a), db=80.0)

    def test_bessel(self):
        b, a = c.bessel(4, 0.25)
        bs, as_ = ss.bessel(4, 0.25, norm="phase")
        _match(_resp_ba(bs, as_), _resp_ba(b, a), db=80.0)

    def test_analog_butter(self):
        b, a = c.butter(3, 100.0, analog=True)
        bs, as_ = ss.butter(3, 100.0, analog=True)
        w = np.logspace(0, 4, 200)
        _, h1 = c.freqs(b, a, w)
        _, h2 = ss.freqs(bs, as_, w)
        _match(h2, h1)

    def test_iirfilter(self):
        b, a = c.iirfilter(4, [0.3, 0.6], rp=1, rs=40, ftype="ellip")
        bs, as_ = ss.iirfilter(4, [0.3, 0.6], rp=1, rs=40, ftype="ellip")
        _match(_resp_ba(bs, as_), _resp_ba(b, a), db=80.0)

    def test_iirdesign_meets_spec(self):
        sos = c.iirdesign(0.2, 0.3, 1.0, 40.0, ftype="butter",
                          output="sos")
        w, h = ss.sosfreqz(np.asarray(sos), worN=2048)
        wn = w / np.pi
        pb = 20 * np.log10(np.abs(h[wn <= 0.2]) + 1e-300)
        sb = 20 * np.log10(np.abs(h[wn >= 0.3]) + 1e-300)
        assert pb.min() >= -1.0 - 1e-6
        assert sb.max() <= -40.0 + 1e-6


class TestConversions:
    def test_zpk_tf_roundtrip(self):
        b, a = ss.butter(4, 0.3)
        z, p, k = c.tf2zpk(b, a)
        b2, a2 = c.zpk2tf(z, p, k)
        assert np.allclose(b2, b, atol=1e-12)
        assert np.allclose(a2, a, atol=1e-12)

    def test_sos2tf_matches_scipy(self):
        sos = ss.butter(5, 0.3, output="sos")
        b1, a1 = c.sos2tf(sos)
        b2, a2 = ss.sos2tf(sos)
        assert np.allclose(b1, b2, atol=1e-12)
        assert np.allclose(a1, a2, atol=1e-12)

    def test_zpk2sos_response(self):
        z, p, k = ss.butter(6, 0.4, output="zpk")
        _match(_resp_sos(ss.zpk2sos(z, p, k)),
               _resp_sos(c.zpk2sos(z, p, k)))

    def test_bilinear_zpk(self):
        z, p, k = ss.butter(3, 10.0, analog=True, output="zpk")
        z1, p1, k1 = c.bilinear_zpk(z, p, k, fs=100.0)
        z2, p2, k2 = ss.bilinear_zpk(z, p, k, fs=100.0)
        assert np.allclose(sorted(p1), sorted(p2))
        assert np.isclose(k1, k2)

    def test_normalize(self):
        b, a = c.normalize([2.0, 4.0], [2.0, 0.0, 1.0])
        bs, as_ = ss.normalize([2.0, 4.0], [2.0, 0.0, 1.0])
        assert np.allclose(b, bs) and np.allclose(a, as_)


class TestUtilities:
    def test_lfiltic(self):
        b, a = ss.butter(3, 0.3)
        y = [0.5, -0.2, 0.1]
        x = [1.0, 0.3, -0.4]
        assert np.allclose(c.lfiltic(b, a, y, x), ss.lfiltic(b, a, y, x),
                           atol=1e-12)

    def test_deconvolve(self):
        sig = np.array([3.0, 2.0, 1.0, 4.0, 5.0, 6.0])
        div = np.array([1.0, 2.0, 1.0])
        q1, r1 = c.deconvolve(sig, div)
        q2, r2 = ss.deconvolve(sig, div)
        assert np.allclose(q1, q2) and np.allclose(r1, r2)

    def test_upfirdn(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(257).astype(np.float64)
        h = ss.firwin(31, 0.4)
        for up, down in [(1, 1), (3, 2), (2, 3), (7, 5), (1, 4)]:
            ours = np.asarray(c.upfirdn(h, x.astype(np.float32), up, down),
                              np.float64)
            ref = ss.upfirdn(h, x, up, down)
            assert ours.shape == ref.shape, (up, down)
            err = ref - ours
            snr = 10 * np.log10((ref**2).sum() / (err**2).sum())
            assert snr >= 110.0

    def test_convolve_modes(self):
        rng = np.random.default_rng(1)
        a = rng.standard_normal(100).astype(np.float32)
        v = rng.standard_normal(17).astype(np.float32)
        for mode in ("full", "same", "valid"):
            ours = np.asarray(c.convolve(a, v, mode=mode), np.float64)
            ref = np.convolve(a.astype(np.float64), v.astype(np.float64),
                              mode=mode)
            assert ours.shape == ref.shape
            assert np.abs(ours - ref).max() < 1e-4

    def test_envelope(self):
        t = np.arange(4096) / 4096
        x = (np.sin(2 * np.pi * 100 * t) *
             (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        env = np.asarray(c.analytic_envelope(x))
        ref = np.abs(ss.hilbert(x.astype(np.float64)))
        interior = slice(256, -256)
        assert np.abs(env[interior] - ref[interior]).max() < 1e-3

    def test_unit_impulse(self):
        assert np.array_equal(c.unit_impulse(7), ss.unit_impulse(7))
        assert np.array_equal(c.unit_impulse(7, "mid"),
                              ss.unit_impulse(7, "mid"))
        assert np.array_equal(c.unit_impulse((3, 3), (1, 2)),
                              ss.unit_impulse((3, 3), (1, 2)))

    def test_lombscargle(self):
        rng = np.random.default_rng(2)
        t = np.sort(rng.uniform(0, 10, 300))
        y = np.sin(2 * np.pi * 1.5 * t) + 0.1 * rng.standard_normal(300)
        freqs = np.linspace(0.5, 30.0, 200)
        ours = np.asarray(c.lombscargle(t, y, freqs), np.float64)
        ref = ss.lombscargle(t, y, freqs)
        assert np.abs(ours - ref).max() / ref.max() < 1e-3
        # the 1.5 Hz line (ω = 2π·1.5 ≈ 9.42) must dominate
        assert abs(freqs[np.argmax(ours)] - 2 * np.pi * 1.5) < 0.5

    def test_find_peaks_basic(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(500)
        p1, _ = c.find_peaks(x)
        p2, _ = ss.find_peaks(x)
        assert np.array_equal(p1, p2)

    def test_find_peaks_height_distance(self):
        rng = np.random.default_rng(4)
        x = np.sin(np.linspace(0, 40, 1000)) + 0.3 * rng.standard_normal(1000)
        p1, pr1 = c.find_peaks(x, height=0.5, distance=20)
        p2, pr2 = ss.find_peaks(x, height=0.5, distance=20)
        assert np.array_equal(p1, p2)
        assert np.allclose(pr1["peak_heights"], pr2["peak_heights"])

    def test_find_peaks_prominence(self):
        x = np.array([0.0, 1, 0.5, 2, 0.2, 3, 0, 1.5, 0.1])
        p1, pr1 = c.find_peaks(x, prominence=1.0)
        p2, pr2 = ss.find_peaks(x, prominence=1.0)
        assert np.array_equal(p1, p2)
        assert np.allclose(pr1["prominences"], pr2["prominences"])

    def test_find_peaks_plateau(self):
        x = np.array([0.0, 1, 1, 1, 0, 2, 2, 0])
        p1, _ = c.find_peaks(x)
        p2, _ = ss.find_peaks(x)
        assert np.array_equal(p1, p2)


class TestButtordWn:
    """buttord's returned wn must make butter(n, wn) meet BOTH specs —
    the pre-r3 version returned the raw passband edge, where any
    Butterworth is −3 dB (violating gpass < 3 specs)."""

    @pytest.mark.parametrize("wp,ws", [
        (0.2, 0.3), (0.4, 0.3), ([0.2, 0.5], [0.1, 0.6]),
        ([0.1, 0.6], [0.2, 0.5]),
    ])
    def test_spec_met(self, wp, ws):
        gpass, gstop = 1.0, 40.0
        n, wn = c.buttord(wp, ws, gpass, gstop)
        ns, wns = ss.buttord(wp, ws, gpass, gstop)
        assert n == ns
        # bandstop edges go through an iterative tightening optimiser
        # (golden-section here, fminbound in scipy) — agree to ~1e-5
        assert np.allclose(np.atleast_1d(wn), np.atleast_1d(wns),
                           rtol=1e-4)
        btype = {1: "low"}.get(np.ndim(wp) + 1)
        if np.ndim(wp) == 0:
            btype = "low" if np.asarray(wp) < np.asarray(ws) else "high"
        else:
            wp_, ws_ = np.asarray(wp), np.asarray(ws)
            btype = ("bandpass" if ws_[0] < wp_[0] else "bandstop")
        sos = c.butter(n, wn, btype=btype, output="sos")
        w, h = ss.sosfreqz(np.asarray(sos), worN=8192)
        wn_ax = w / np.pi
        mag = 20 * np.log10(np.abs(h) + 1e-300)
        wp_, ws_ = np.atleast_1d(wp), np.atleast_1d(ws)
        if btype == "low":
            pb, sb = wn_ax <= wp_[0], wn_ax >= ws_[0]
        elif btype == "high":
            pb, sb = wn_ax >= wp_[0], wn_ax <= ws_[0]
        elif btype == "bandpass":
            pb = (wn_ax >= wp_[0]) & (wn_ax <= wp_[1])
            sb = (wn_ax <= ws_[0]) | (wn_ax >= ws_[1])
        else:
            pb = (wn_ax <= wp_[0]) | (wn_ax >= wp_[1])
            sb = (wn_ax >= ws_[0]) & (wn_ax <= ws_[1])
        assert mag[pb].min() >= -gpass - 1e-3
        assert mag[sb].max() <= -gstop + 1e-3
