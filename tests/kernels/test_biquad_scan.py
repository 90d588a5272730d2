"""Pallas biquad-cascade kernel vs ops/goldens, interpreter mode
(SURVEY.md §4.3 — Pallas-TPU kernels get interpret-mode tests on CPU)."""

import numpy as np
import pytest
import scipy.signal as ss

import llzlab_tpu as lz
from llzlab_tpu.kernels.biquad_scan import sosfilt_pallas, supports

EQ = lz.peaking_eq_sos(
    [100, 200, 400, 800, 1600, 3200, 6400, 12800],
    [3, -4, 5, -2, 6, -3, 2, -5],
    48000.0,
    q=1.0,
)


class TestBiquadKernel:
    def test_supports(self):
        assert supports(EQ)
        assert supports(lz.butter_sos(8, 0.3))
        real_pole = np.array([[0.5, 0.2, 0.1, 1.0, -1.1, 0.3]])
        assert not supports(real_pole)

    def test_vs_f64_golden(self, snr):
        rng = np.random.default_rng(101)
        x = rng.standard_normal((8, 8192)).astype(np.float32)
        y, _ = sosfilt_pallas(EQ, x, block_size=2048, interpret=True)
        ref = ss.sosfilt(EQ, x.astype(np.float64), axis=-1)
        assert snr(ref, np.asarray(y)) >= 120.0

    def test_vs_op_scan(self, snr):
        rng = np.random.default_rng(102)
        x = rng.standard_normal((4, 8192)).astype(np.float32)
        y, _ = sosfilt_pallas(EQ, x, block_size=2048, interpret=True)
        y_op = np.asarray(lz.sosfilt(EQ, x, block_size=2048))
        assert snr(y_op, np.asarray(y)) >= 120.0

    def test_streaming_bit_exact(self):
        rng = np.random.default_rng(103)
        x = rng.standard_normal((8, 16384)).astype(np.float32)
        y_full, _ = sosfilt_pallas(EQ, x, block_size=2048, interpret=True)
        y1, z1 = sosfilt_pallas(EQ, x[:, :8192], block_size=2048, interpret=True)
        y2, _ = sosfilt_pallas(EQ, x[:, 8192:], zi=z1, block_size=2048,
                               interpret=True)
        y_cat = np.concatenate([np.asarray(y1), np.asarray(y2)], -1)
        np.testing.assert_array_equal(y_cat, np.asarray(y_full))

    def test_tail_padding(self, snr):
        """Non-multiple lengths: output trimmed, zf at the true last sample."""
        rng = np.random.default_rng(104)
        x = rng.standard_normal((4, 5000)).astype(np.float32)
        y, zf = sosfilt_pallas(EQ, x, block_size=2048, interpret=True)
        assert y.shape == (4, 5000)
        ref = ss.sosfilt(EQ, x.astype(np.float64), axis=-1)
        assert snr(ref, np.asarray(y)) >= 120.0
        _, zf_op = lz.sosfilt(EQ, x, block_size=2048, return_zf=True)
        assert snr(np.asarray(zf_op), np.asarray(zf)) >= 100.0

    def test_batch_tiling(self, snr):
        """Channel counts not divisible by the tile still work."""
        rng = np.random.default_rng(105)
        x = rng.standard_normal((3, 4096)).astype(np.float32)
        y, _ = sosfilt_pallas(EQ, x, block_size=2048, interpret=True)
        ref = ss.sosfilt(EQ, x.astype(np.float64), axis=-1)
        assert snr(ref, np.asarray(y)) >= 120.0

    def test_real_pole_raises(self):
        real_pole = np.array([[0.5, 0.2, 0.1, 1.0, -1.1, 0.3]])
        with pytest.raises(ValueError):
            sosfilt_pallas(real_pole, np.zeros((1, 2048), np.float32),
                           interpret=True)
