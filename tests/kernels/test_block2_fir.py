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

    def test_low_channel_fold_bit_exact(self):
        """The fold-into-M fast path (1–7 channels) must reproduce the
        unfolded engine bit-for-bit, streaming state included
        (VERDICT r2 missing #5 — config-1 fast path)."""
        from llzlab_tpu.ops.fir import (
            _fir_filter_block2_pallas_folded, fir_filter,
        )

        rng = np.random.default_rng(10)
        taps = lz.firwin(1024, 0.25)
        block = block2_block(1024)
        for c, t in [(1, 8 * block), (2, 5 * block), (3, 4 * block + 17)]:
            x = rng.standard_normal((c, t)).astype(np.float32)
            # unfolded reference through the same kernel (rows padded to 8)
            xp = np.concatenate(
                [np.zeros((c, block), np.float32), x,
                 np.zeros((c, (-t) % block), np.float32)], axis=1)
            xp8 = np.concatenate(
                [xp, np.zeros((8 - c, xp.shape[1]), np.float32)])
            ref = np.asarray(
                bf.block2_fir_pallas(jnp.asarray(xp8), taps, block,
                                     mode="high", interpret=True)
            )[:c, :t]
            y, zf = _fir_filter_block2_pallas_folded(
                jnp.asarray(x), np.asarray(taps, np.float64), None,
                block=block, mode="high", return_zf=True, interpret=True,
            )
            np.testing.assert_array_equal(np.asarray(y), ref)
            exp_zf = np.concatenate(
                [np.zeros((c, block), np.float32), x], axis=1)[:, -block:]
            np.testing.assert_array_equal(np.asarray(zf), exp_zf)

    def test_low_channel_fold_streaming(self):
        """Fold path split-and-carry == one-shot, bit-for-bit."""
        from llzlab_tpu.ops.fir import _fir_filter_block2_pallas_folded

        rng = np.random.default_rng(11)
        taps = lz.firwin(1024, 0.25)
        block = block2_block(1024)
        t = 4 * block
        x = rng.standard_normal((1, 2 * t)).astype(np.float32)
        full = np.asarray(_fir_filter_block2_pallas_folded(
            jnp.asarray(x), np.asarray(taps, np.float64), None,
            block=block, mode="high", return_zf=False, interpret=True))
        y1, zf = _fir_filter_block2_pallas_folded(
            jnp.asarray(x[:, :t]), np.asarray(taps, np.float64), None,
            block=block, mode="high", return_zf=True, interpret=True)
        y2 = _fir_filter_block2_pallas_folded(
            jnp.asarray(x[:, t:]), np.asarray(taps, np.float64),
            jnp.asarray(zf), block=block, mode="high", return_zf=False,
            interpret=True)
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(y1), np.asarray(y2)], 1), full)

    def test_tail_handling(self, snr):
        """Non-multiple-of-block signal lengths are padded and truncated."""
        rng = np.random.default_rng(9)
        taps = lz.firwin(513, 0.4)
        x = rng.standard_normal((8, 1234)).astype(np.float32)
        ref = ss.lfilter(taps, [1.0], x.astype(np.float64), axis=-1)
        y = _run(taps, x, "highest")
        assert y.shape == x.shape
        assert snr(ref, y) >= 118.0
