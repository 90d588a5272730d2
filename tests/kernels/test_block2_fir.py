"""Fused block2 FIR Pallas kernel vs scipy golden, interpreter mode
(SURVEY.md §4.3 — Pallas-TPU kernels get interpret-mode tests on CPU)."""

import numpy as np
import pytest
import scipy.signal as ss

import jax.numpy as jnp

import llzlab_tpu as lz
from llzlab_tpu.kernels import block2_fir as bf
from llzlab_tpu.ops.fir import block2_block


def _run(taps, x, mode):
    block = block2_block(len(taps))
    c = x.shape[0]
    xpad = np.concatenate([np.zeros((c, block), np.float32), x], axis=1)
    return np.asarray(
        bf.block2_fir_pallas(
            jnp.asarray(xpad), taps, block, mode=mode, interpret=True
        )
    )


class TestBlock2Kernel:
    def test_supports(self):
        assert bf.supports(64, 1024, 1024)
        assert not bf.supports(4, 1024, 1024)      # too few channels
        assert not bf.supports(12, 1024, 1024)     # not multiple of 8
        assert not bf.supports(64, 4097, 4096)     # beyond block cap

    @pytest.mark.parametrize("ntaps", [129, 513, 1024, 1025])
    def test_vs_scipy_golden(self, snr, ntaps):
        rng = np.random.default_rng(7)
        taps = lz.firwin(ntaps, 0.3)
        x = rng.standard_normal((8, 4000)).astype(np.float32)
        ref = ss.lfilter(taps, [1.0], x.astype(np.float64), axis=-1)
        assert snr(ref, _run(taps, x, "high")) >= 100.0
        assert snr(ref, _run(taps, x, "highest")) >= 118.0

    def test_streaming_split_exact(self):
        """Splitting at a block boundary and carrying history reproduces
        the unsplit output bit-for-bit (BASELINE.json:9 invariant)."""
        rng = np.random.default_rng(8)
        taps = lz.firwin(1024, 0.25)
        block = block2_block(1024)
        c, t = 8, 4096
        x = rng.standard_normal((c, 2 * t)).astype(np.float32)
        xpad = np.concatenate([np.zeros((c, block), np.float32), x], axis=1)
        full = np.asarray(
            bf.block2_fir_pallas(jnp.asarray(xpad), taps, block,
                                 mode="highest", interpret=True)
        )
        y1 = np.asarray(
            bf.block2_fir_pallas(jnp.asarray(xpad[:, : block + t]), taps,
                                 block, mode="highest", interpret=True)
        )
        y2 = np.asarray(
            bf.block2_fir_pallas(jnp.asarray(xpad[:, t:]), taps, block,
                                 mode="highest", interpret=True)
        )
        np.testing.assert_array_equal(np.concatenate([y1, y2], 1), full)

    def test_tail_handling(self, snr):
        """Non-multiple-of-block signal lengths are padded and truncated."""
        rng = np.random.default_rng(9)
        taps = lz.firwin(513, 0.4)
        x = rng.standard_normal((8, 1234)).astype(np.float32)
        ref = ss.lfilter(taps, [1.0], x.astype(np.float64), axis=-1)
        y = _run(taps, x, "highest")
        assert y.shape == x.shape
        assert snr(ref, y) >= 118.0
