"""Signal generators + firwin2/kaiser design helpers vs scipy."""

import numpy as np
import pytest
import scipy.signal as ss

from llzlab_tpu.ops import fir as f
from llzlab_tpu.ops import signals as sig


class TestFirwin2:
    @pytest.mark.parametrize(
        "nt,fr,gn",
        [
            (129, [0, 0.3, 0.5, 1], [1, 1, 0, 0]),
            (101, [0, 0.2, 0.2, 1], [1, 1, 0, 0]),  # step edge (dup freq)
            (64, [0, 0.5, 1], [1, 1, 0]),
        ],
    )
    def test_matches_scipy(self, nt, fr, gn):
        np.testing.assert_allclose(
            f.firwin2(nt, fr, gn), ss.firwin2(nt, fr, gn), atol=1e-14
        )

    def test_kaiser_helpers(self):
        assert f.kaiserord(65, 0.05) == ss.kaiserord(65, 0.05)
        assert f.kaiser_atten(101, 0.05) == ss.kaiser_atten(101, 0.05)
        assert f.kaiser_beta(30) == ss.kaiser_beta(30)


class TestGenerators:
    def test_chirp_matches_scipy(self):
        t = np.linspace(0, 2, 9600)
        for m in ("linear", "quadratic", "logarithmic", "hyperbolic"):
            np.testing.assert_allclose(
                sig.chirp(t, 100, 2, 800, method=m),
                ss.chirp(t, 100, 2, 800, method=m), atol=1e-12)

    def test_square_sawtooth_gausspulse(self):
        t = np.linspace(0, 2, 9600) * 50
        np.testing.assert_allclose(sig.square(t, 0.3), ss.square(t, 0.3))
        np.testing.assert_allclose(sig.sawtooth(t, 0.7), ss.sawtooth(t, 0.7),
                                   atol=1e-12)
        tt = np.linspace(-0.01, 0.01, 2001)
        np.testing.assert_allclose(
            sig.gausspulse(tt, fc=1500, bw=0.6),
            ss.gausspulse(tt, fc=1500, bw=0.6), atol=1e-12)

    def test_tone_and_noise(self):
        x = sig.tone(1000, 0.1, 48000)
        assert len(x) == 4800
        spec = np.abs(np.fft.rfft(x))
        assert np.argmax(spec) == 100  # 1 kHz bin at 0.1 s
        v = sig.noisy_tones([997, 3001], 0.5, 48000, snr_db=40)
        assert len(v) == 24000
        # Pink noise rolls off ~1/f.
        p = sig.pink_noise(1 << 15)
        P = np.abs(np.fft.rfft(p)) ** 2
        lo = P[8:64].mean()
        hi = P[8 * 64 : 64 * 64].mean()
        assert lo / hi > 20.0
