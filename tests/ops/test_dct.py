"""DCT/DST types I–IV vs scipy.fft + exact roundtrips."""

import numpy as np
import pytest
import scipy.fft as sf

import sys

from llzlab_tpu.ops import dct as _  # ensure submodule is loaded  # noqa: F401

d = sys.modules["llzlab_tpu.ops.dct"]


@pytest.fixture(scope="module")
def x():
    return np.random.default_rng(0).standard_normal((3, 128)).astype(np.float32)


@pytest.mark.parametrize("t", [1, 2, 3, 4])
@pytest.mark.parametrize("norm", [None, "ortho"])
class TestDctDst:
    def test_dct_matches_scipy(self, x, t, norm):
        y = np.asarray(d.dct(x, type=t, norm=norm))
        ref = sf.dct(x.astype(np.float64), type=t, norm=norm, axis=-1)
        np.testing.assert_allclose(y, ref, rtol=0, atol=2e-5 * np.max(np.abs(ref)))

    def test_dst_matches_scipy(self, x, t, norm):
        y = np.asarray(d.dst(x, type=t, norm=norm))
        ref = sf.dst(x.astype(np.float64), type=t, norm=norm, axis=-1)
        np.testing.assert_allclose(y, ref, rtol=0, atol=2e-5 * np.max(np.abs(ref)))

    def test_roundtrips(self, x, t, norm):
        rt = np.asarray(d.idct(d.dct(x, type=t, norm=norm), type=t, norm=norm))
        np.testing.assert_allclose(rt, x, rtol=0, atol=5e-5)
        rt = np.asarray(d.idst(d.dst(x, type=t, norm=norm), type=t, norm=norm))
        np.testing.assert_allclose(rt, x, rtol=0, atol=5e-5)
