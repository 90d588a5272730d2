"""Fused Pallas overlap-save kernel vs scipy golden (interpret mode).

SURVEY.md §4.3: Pallas kernels get interpreter-mode tests on CPU; the
real-hardware run is exercised by bench/tpu_fused_probe.py.
"""

import numpy as np
import pytest
import scipy.signal as ss

import llzlab_tpu as lz
from llzlab_tpu.kernels import ols_fused as of
from llzlab_tpu.ops.fir import ols_hop


@pytest.fixture(scope="module")
def taps():
    return lz.firwin(1024, 0.25, window="hamming")


HOP = 31744  # ols_hop(1024, 32768)
HIST = of.NFFT - HOP


class TestOlsFusedKernel:
    def test_geometry(self):
        assert ols_hop(1024, of.NFFT) == HOP
        assert HIST == 1024 and (HIST // 2) % of.N == 512 % 128 == 0

    def test_snr_vs_scipy(self, taps, snr):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 70000)).astype(np.float32)
        import jax.numpy as jnp

        xp = jnp.asarray(
            np.concatenate([np.zeros((2, HIST), np.float32), x], -1)
        )
        y = np.asarray(of.ols_filter_pallas(xp, taps, HIST, interpret=True))
        for i in range(2):
            ref = ss.lfilter(taps, [1.0], x[i].astype(np.float64))
            assert snr(ref, y[i]) >= 80.0  # typically ~128

    def test_history_carry(self, taps, snr):
        # Nonzero zi must reproduce the middle of a longer filtering run.
        rng = np.random.default_rng(6)
        x = rng.standard_normal(HOP + 5000).astype(np.float32)
        full = np.asarray(
            lz.fir_filter(x, taps, method="ols", spectral="pallas")
        )
        _, zf = lz.fir_filter(
            x[:HOP], taps, method="ols", spectral="pallas", return_zf=True
        )
        tail = np.asarray(
            lz.fir_filter(
                x[HOP:], taps, method="ols", spectral="pallas", zi=zf
            )
        )
        assert snr(full[HOP:], tail) >= 130.0

    def test_matches_fft_engine(self, taps, snr):
        rng = np.random.default_rng(7)
        x = rng.standard_normal(40000).astype(np.float32)
        a = np.asarray(lz.fir_filter(x, taps, method="ols", spectral="pallas"))
        b = np.asarray(lz.fir_filter(x, taps, method="ols", spectral="fft"))
        assert snr(b, a) >= 110.0

    def test_wrong_nfft_raises(self, taps):
        x = np.zeros(4096, np.float32)
        with pytest.raises(ValueError):
            lz.fir_filter(x, taps, method="ols", nfft=8192, spectral="pallas")
