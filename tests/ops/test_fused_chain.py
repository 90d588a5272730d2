"""Fused FIR→resample engine + block2 FIR engine vs scipy goldens.

These are the headline-bench fast paths (BASELINE.json:2 chain); the
fused composite must equal upfirdn(lfilter(x)) and stream exactly.
"""

import numpy as np
import pytest
import scipy.signal as ss

import llzlab_tpu as lz
from llzlab_tpu.ops import fir as fir_mod
from llzlab_tpu.ops import fused_chain as fc


def _snr(ref, y):
    ref = np.asarray(ref, np.float64)
    y = np.asarray(y, np.float64)
    n = min(ref.shape[-1], y.shape[-1])
    ref, y = ref[..., :n], y[..., :n]
    return 10 * np.log10(np.sum(ref**2) / np.sum((ref - y) ** 2))


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((3, 48000)).astype(np.float32)
    taps = lz.firwin(1024, 0.25, window="hamming")
    rtaps = lz.resample_taps(147, 160, 64)
    y64 = ss.lfilter(taps, [1.0], x[0].astype(np.float64))
    z64 = ss.upfirdn(rtaps, y64, 147, 160)
    return x, taps, rtaps, y64, z64


class TestBlock2:
    def test_matches_golden(self, vectors):
        x, taps, _, y64, _ = vectors
        y = lz.fir_filter(x, taps, method="block2")
        assert y.shape == x.shape
        assert _snr(y64, y[0]) > 120.0

    def test_streaming_bit_exact(self, vectors):
        x, taps, _, _, _ = vectors
        y = np.asarray(lz.fir_filter(x, taps, method="block2"))
        hlen = fir_mod.fir_state_len(1024, method="block2")
        assert hlen == fir_mod.block2_block(1024) == 1024
        st = np.zeros((3, hlen), np.float32)
        cut = 24576  # multiple of the block
        y1, st1 = lz.fir_filter(x[:, :cut], taps, method="block2",
                                zi=st, return_zf=True)
        y2 = lz.fir_filter(x[:, cut:], taps, method="block2", zi=st1)
        cat = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
        np.testing.assert_array_equal(y, cat)

    def test_short_filter_and_ragged_tail(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 1000)).astype(np.float32)
        taps = lz.firwin(33, 0.4)
        y = lz.fir_filter(x, taps, method="block2")
        ref = ss.lfilter(taps, [1.0], x[0].astype(np.float64))
        assert _snr(ref, y[0]) > 110.0


class TestFusedChain:
    def test_matches_golden(self, vectors):
        x, taps, rtaps, _, z64 = vectors
        z = lz.fir_resample(x, taps, 147, 160, rtaps=rtaps)
        assert z.shape == (3, 44100)
        assert _snr(z64, z[0]) > 120.0

    def test_matches_unfused(self, vectors):
        x, taps, rtaps, _, _ = vectors
        y = lz.fir_filter(x, taps, method="ols")
        z_ref = lz.resample_poly(y, 147, 160, taps=rtaps)
        z = lz.fir_resample(x, taps, 147, 160, rtaps=rtaps)
        assert _snr(np.asarray(z_ref), np.asarray(z)) > 120.0

    def test_streaming_bit_exact(self, vectors):
        x, taps, rtaps, _, _ = vectors
        z = np.asarray(lz.fir_resample(x, taps, 147, 160, rtaps=rtaps))
        hl = fc.fir_resample_state_len(1024, 147, 160, len(rtaps))
        st = np.zeros((3, hl), np.float32)
        cut = 160 * 120  # multiple of down
        z1, stf = lz.fir_resample(x[:, :cut], taps, 147, 160, rtaps=rtaps,
                                  zi=st, return_zf=True)
        z2 = lz.fir_resample(x[:, cut:], taps, 147, 160, rtaps=rtaps, zi=stf)
        cat = np.concatenate([np.asarray(z1), np.asarray(z2)], axis=-1)
        np.testing.assert_array_equal(z, cat)

    def test_gcd_reduction_and_autodesign(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((1, 9600)).astype(np.float32)
        taps = lz.firwin(257, 0.3)
        # 48000→44100 unreduced: gcd 300 → 147/160.
        z = lz.fir_resample(x, taps, 44100, 48000)
        assert z.shape[-1] == -(-9600 * 147 // 160)
