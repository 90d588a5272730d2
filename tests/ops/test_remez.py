"""Parks–McClellan remez vs scipy.signal.remez (minimax responses agree)."""

import numpy as np
import pytest
import scipy.signal as ss

from llzlab_tpu.ops.remez import remez


def _resp_err(h1, h2, worn=8192):
    _, H1 = ss.freqz(h1, worN=worn)
    _, H2 = ss.freqz(h2, worN=worn)
    return float(np.max(np.abs(np.abs(H1) - np.abs(H2))))


class TestRemez:
    @pytest.mark.parametrize(
        "nt,b,d,w",
        [
            (65, [0, 0.2, 0.25, 0.5], [1, 0], None),
            (101, [0, 0.15, 0.2, 0.5], [1, 0], [1, 10]),
            (55, [0, 0.1, 0.15, 0.35, 0.4, 0.5], [0, 1, 0], None),  # bandpass
            (64, [0, 0.2, 0.25, 0.5], [1, 0], None),  # type II
            (33, [0, 0.18, 0.24, 0.5], [1, 0], [2, 1]),
            (128, [0, 0.3, 0.35, 0.5], [1, 0], None),
            (181, [0, 0.1, 0.13, 0.37, 0.4, 0.5], [1, 0, 1], [1, 5, 1]),
        ],
    )
    def test_matches_scipy_response(self, nt, b, d, w):
        h = remez(nt, b, d, weight=w)
        hs = ss.remez(nt, b, d, weight=w)
        assert len(h) == nt
        assert _resp_err(h, hs) < 2e-3

    def test_long_filter_fallback(self):
        # High-degree case where the barycentric exchange stalls and the
        # Lawson IRLS fallback must deliver the minimax solution.
        nt, b, d = 255, [0, 0.22, 0.26, 0.5], [1, 0]
        h = remez(nt, b, d)
        hs = ss.remez(nt, b, d)
        assert _resp_err(h, hs) < 2e-3

    def test_equiripple_property(self):
        h = remez(65, [0, 0.2, 0.25, 0.5], [1, 0])
        w, H = ss.freqz(h, worN=16384)
        f = w / (2 * np.pi)
        pb = np.abs(H)[f <= 0.2]
        sb = np.abs(H)[f >= 0.25]
        # Passband and stopband peak deviations equal (weight 1:1).
        assert abs(np.max(np.abs(pb - 1)) - np.max(sb)) < 1e-4

    def test_linear_phase_symmetry(self):
        h = remez(65, [0, 0.2, 0.25, 0.5], [1, 0])
        np.testing.assert_allclose(h, h[::-1], atol=1e-12)
        h2 = remez(64, [0, 0.2, 0.25, 0.5], [1, 0])
        np.testing.assert_allclose(h2, h2[::-1], atol=1e-12)

    def test_nyquist_type2_rejected(self):
        with pytest.raises(ValueError):
            remez(64, [0, 0.2, 0.25, 0.5], [1, 1])
