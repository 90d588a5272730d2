"""MDCT/IMDCT: TDAC perfect reconstruction + f64 golden (SURVEY.md §2b r14)."""

import numpy as np
import pytest

from llzlab_tpu.ops.mdct import imdct, mdct, mdct_matrix, sine_window


class TestMDCT:
    @pytest.mark.parametrize("n", [256, 1024])
    def test_perfect_reconstruction(self, n, snr):
        rng = np.random.default_rng(121)
        x = rng.standard_normal((3, n * 12)).astype(np.float32)
        y = np.asarray(imdct(mdct(x, n), length=x.shape[-1]))
        assert snr(x[:, n:-n], y[:, n:-n]) >= 110.0

    def test_frame_vs_f64_golden(self, snr):
        rng = np.random.default_rng(122)
        n = 1024
        x = rng.standard_normal(n * 8).astype(np.float32)
        S = np.asarray(mdct(x, n))
        w = sine_window(2 * n)
        for f in (0, 3, 6):
            frame = x[f * n : f * n + 2 * n].astype(np.float64) * w
            ref = mdct_matrix(n) @ frame
            assert snr(ref, S[f]) >= 110.0

    def test_shape(self):
        x = np.zeros((2, 1024 * 10), np.float32)
        assert mdct(x, 1024).shape == (2, 9, 1024)

    def test_non_multiple_raises(self):
        with pytest.raises(ValueError):
            mdct(np.zeros(1000, np.float32), 256)
