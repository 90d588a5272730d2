"""IIR design families (cheby2/ellip/bessel) + order selection vs scipy.

Extends the reference's bilinear design surface (llz_iir.c analog; mount
empty — SURVEY.md §2a row 5) to the full classical-prototype catalogue.
"""

import numpy as np
import pytest
import scipy.signal as ss

import llzlab_tpu as lz
from llzlab_tpu.ops import iir as li


def _maxerr(mine, sp, worn=1024):
    _, h1 = ss.sosfreqz(np.asarray(mine), worN=worn)
    _, h2 = ss.sosfreqz(sp, worN=worn)
    return float(np.max(np.abs(h1 - h2)))


class TestCheby2:
    @pytest.mark.parametrize("order,rs,wn", [(8, 40, 0.3), (7, 50, 0.4), (3, 30, 0.1)])
    def test_lowpass(self, order, rs, wn):
        assert _maxerr(lz.cheby2_sos(order, rs, wn),
                       ss.cheby2(order, rs, wn, output="sos")) < 1e-9

    def test_highpass_and_bands(self):
        assert _maxerr(lz.cheby2_sos(6, 45, 0.5, btype="highpass"),
                       ss.cheby2(6, 45, 0.5, btype="highpass", output="sos")) < 1e-9
        assert _maxerr(lz.cheby2_sos(4, 40, [0.2, 0.5], btype="bandpass"),
                       ss.cheby2(4, 40, [0.2, 0.5], btype="bandpass", output="sos")) < 1e-9
        assert _maxerr(lz.cheby2_sos(4, 40, [0.2, 0.5], btype="bandstop"),
                       ss.cheby2(4, 40, [0.2, 0.5], btype="bandstop", output="sos")) < 1e-9


class TestEllip:
    @pytest.mark.parametrize(
        "order,rp,rs,wn",
        [(7, 1, 60, 0.3), (2, 3, 30, 0.4), (1, 1, 40, 0.3), (8, 0.5, 70, 0.25)],
    )
    def test_lowpass(self, order, rp, rs, wn):
        assert _maxerr(lz.ellip_sos(order, rp, rs, wn),
                       ss.ellip(order, rp, rs, wn, output="sos")) < 1e-7

    def test_highpass_bandpass(self):
        assert _maxerr(lz.ellip_sos(6, 0.5, 80, 0.2, btype="highpass"),
                       ss.ellip(6, 0.5, 80, 0.2, btype="highpass", output="sos")) < 1e-7
        assert _maxerr(lz.ellip_sos(4, 1, 50, [0.2, 0.5], btype="bandpass"),
                       ss.ellip(4, 1, 50, [0.2, 0.5], btype="bandpass", output="sos")) < 1e-7

    def test_spec_met(self):
        # The designed filter actually meets its rp/rs template.
        sos = np.asarray(lz.ellip_sos(7, 1, 60, 0.3))
        w, h = ss.sosfreqz(sos, worN=4096)
        mag = 20 * np.log10(np.abs(h) + 1e-300)
        passband = mag[w <= 0.3 * np.pi * 0.999]
        stopband = mag[w >= 0.36 * np.pi]
        assert passband.min() > -1.01 and passband.max() < 0.01
        assert stopband.max() < -59.9


class TestBessel:
    @pytest.mark.parametrize("norm", ["phase", "delay", "mag"])
    def test_norms(self, norm):
        assert _maxerr(lz.bessel_sos(6, 0.2, norm=norm),
                       ss.bessel(6, 0.2, output="sos", norm=norm)) < 1e-12

    def test_highpass(self):
        assert _maxerr(lz.bessel_sos(3, 0.4, btype="highpass"),
                       ss.bessel(3, 0.4, btype="highpass", output="sos")) < 1e-12


class TestIirfilterFrontDoor:
    def test_dispatch(self):
        assert _maxerr(lz.iirfilter_sos(4, 0.3, ftype="butter"),
                       ss.butter(4, 0.3, output="sos")) < 1e-12
        assert _maxerr(lz.iirfilter_sos(4, 0.3, ftype="cheby1", rp=1),
                       ss.cheby1(4, 1, 0.3, output="sos")) < 1e-12
        assert _maxerr(lz.iirfilter_sos(4, 0.3, ftype="cheby2", rs=40),
                       ss.cheby2(4, 40, 0.3, output="sos")) < 1e-9
        assert _maxerr(lz.iirfilter_sos(4, 0.3, ftype="ellip", rp=1, rs=40),
                       ss.ellip(4, 1, 40, 0.3, output="sos")) < 1e-7

    def test_missing_ripple_raises(self):
        with pytest.raises(ValueError):
            lz.iirfilter_sos(4, 0.3, ftype="cheby1")
        with pytest.raises(ValueError):
            lz.iirfilter_sos(4, 0.3, ftype="ellip", rp=1)

    def test_filterable(self):
        # The designed SOS runs through the parallel-scan sosfilt.
        sos = lz.iirfilter_sos(5, 0.25, ftype="ellip", rp=0.5, rs=50)
        x = np.random.default_rng(0).standard_normal(4096).astype(np.float32)
        y = np.asarray(lz.sosfilt(sos, x))
        ref = ss.sosfilt(np.asarray(sos), x.astype(np.float64))
        err = ref - y
        snr = 10 * np.log10(np.sum(ref**2) / np.sum(err**2))
        assert snr > 80.0


class TestOrderSelection:
    def test_orders_match_scipy(self):
        for wp, ws in [(0.2, 0.3), (0.4, 0.3), ([0.2, 0.5], [0.1, 0.6]),
                       ([0.1, 0.6], [0.2, 0.5])]:
            for g_p, g_s in [(1, 40), (3, 60), (0.5, 80)]:
                for ours, theirs in [
                    (li.buttord, ss.buttord), (li.cheb1ord, ss.cheb1ord),
                    (li.cheb2ord, ss.cheb2ord), (li.ellipord, ss.ellipord),
                ]:
                    assert ours(wp, ws, g_p, g_s)[0] == theirs(wp, ws, g_p, g_s)[0]

    def test_designed_at_selected_order_meets_spec(self):
        n, wn = li.ellipord(0.2, 0.3, 1, 40)
        sos = np.asarray(lz.ellip_sos(n, 1, 40, float(wn)))
        w, h = ss.sosfreqz(sos, worN=4096)
        mag = 20 * np.log10(np.abs(h) + 1e-300)
        assert mag[w <= 0.2 * np.pi * 0.999].min() > -1.01
        assert mag[w >= 0.3 * np.pi].max() < -39.9
