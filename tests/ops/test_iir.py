"""IIR design + parallel-scan filtering vs scipy (SURVEY.md §4.2; BASELINE.json:9)."""

import numpy as np
import pytest
import scipy.signal as ss

import llzlab_tpu as lz


def _freq_response_match(sos_ours, sos_ref, tol=1e-10):
    w0, h0 = ss.sosfreqz(sos_ref, worN=2048)
    w1, h1 = ss.sosfreqz(sos_ours, worN=2048)
    assert np.max(np.abs(h0 - h1)) < tol


class TestDesign:
    @pytest.mark.parametrize("order", [2, 4, 8])
    @pytest.mark.parametrize("btype,wn", [
        ("lowpass", 0.3), ("highpass", 0.4), ("bandpass", [0.2, 0.5]),
        ("bandstop", [0.3, 0.6]),
    ])
    def test_butter_response(self, order, btype, wn):
        ours = lz.butter_sos(order, wn, btype)
        ref = ss.butter(order, wn, btype, output="sos")
        _freq_response_match(ours, ref)

    @pytest.mark.parametrize("order", [3, 6])
    def test_cheby1_response(self, order):
        ours = lz.cheby1_sos(order, 1.0, 0.35)
        ref = ss.cheby1(order, 1.0, 0.35, output="sos")
        _freq_response_match(ours, ref)

    def test_peaking_eq_is_flat_at_zero_gain(self):
        sos = lz.peaking_eq_sos([500.0], [0.0], 48000.0)
        w, h = ss.sosfreqz(sos, worN=512)
        np.testing.assert_allclose(np.abs(h), 1.0, atol=1e-12)

    def test_peaking_eq_gain_at_center(self):
        sos = lz.peaking_eq_sos([1000.0], [6.0], 48000.0, q=2.0)
        w, h = ss.sosfreqz(sos, worN=[2 * np.pi * 1000 / 48000], fs=2 * np.pi)
        np.testing.assert_allclose(
            20 * np.log10(np.abs(h[0])), 6.0, atol=1e-6
        )


EQ_FREQS = [100, 200, 400, 800, 1600, 3200, 6400, 12800]
EQ_GAINS = [3, -4, 5, -2, 6, -3, 2, -5]


class TestSosfilt:
    """Config 3 (BASELINE.json:9): 8-section EQ cascade, 64 channels."""

    @pytest.fixture(scope="class")
    def sos8(self):
        return lz.peaking_eq_sos(EQ_FREQS, EQ_GAINS, 48000.0, q=1.0)

    def test_snr_vs_f64_golden(self, sos8, snr):
        rng = np.random.default_rng(11)
        x = rng.standard_normal(48000).astype(np.float32)
        ref = ss.sosfilt(sos8, x.astype(np.float64))
        y = np.asarray(lz.sosfilt(sos8, x))
        s = snr(ref, y)
        assert s >= 80.0  # BASELINE bound
        assert s >= 120.0  # coupled-form scan beats serial f32 (~85 dB)

    def test_butter_snr(self, snr):
        sos = lz.butter_sos(8, 0.1)
        rng = np.random.default_rng(12)
        x = rng.standard_normal(30000).astype(np.float32)
        ref = ss.sosfilt(sos, x.astype(np.float64))
        assert snr(ref, np.asarray(lz.sosfilt(sos, x))) >= 100.0

    def test_real_pole_section(self, snr):
        sos = np.array([[0.5, 0.2, 0.1, 1.0, -1.1, 0.3]])  # real poles
        rng = np.random.default_rng(13)
        x = rng.standard_normal(20000).astype(np.float32)
        ref = ss.sosfilt(sos, x.astype(np.float64))
        assert snr(ref, np.asarray(lz.sosfilt(sos, x))) >= 100.0

    def test_64_channels(self, sos8, snr):
        rng = np.random.default_rng(14)
        x = rng.standard_normal((64, 12000)).astype(np.float32)
        y = np.asarray(lz.sosfilt(sos8, x))
        ref = ss.sosfilt(sos8, x.astype(np.float64), axis=-1)
        assert snr(ref, y) >= 100.0

    def test_state_carry_bit_exact(self, sos8):
        """Splitting at any block boundary reproduces the unsplit output
        bit-for-bit — the BASELINE.json:9 'bit-matched state carry'."""
        rng = np.random.default_rng(15)
        x = rng.standard_normal(40960).astype(np.float32)
        y_full = np.asarray(lz.sosfilt(sos8, x, block_size=4096))
        for split in (4096, 8192, 20480, 36864):
            ya, zf = lz.sosfilt(sos8, x[:split], block_size=4096, return_zf=True)
            yb = lz.sosfilt(sos8, x[split:], block_size=4096, zi=zf)
            y_cat = np.concatenate([np.asarray(ya), np.asarray(yb)])
            np.testing.assert_array_equal(y_cat, y_full)

    def test_three_way_split_bit_exact(self, sos8):
        rng = np.random.default_rng(16)
        x = rng.standard_normal(24576).astype(np.float32)
        y_full = np.asarray(lz.sosfilt(sos8, x, block_size=4096))
        parts, zi = [], None
        for blk in x.reshape(3, 8192):
            y, zi = lz.sosfilt(sos8, blk, block_size=4096, zi=zi, return_zf=True)
            parts.append(np.asarray(y))
        np.testing.assert_array_equal(np.concatenate(parts), y_full)

    def test_impulse_response(self, sos8, snr):
        x = np.zeros(8192, np.float32)
        x[0] = 1.0
        ref = ss.sosfilt(sos8, x.astype(np.float64))
        assert snr(ref, np.asarray(lz.sosfilt(sos8, x))) >= 100.0

    def test_block_size_invariance(self, sos8, snr):
        rng = np.random.default_rng(17)
        x = rng.standard_normal(16384).astype(np.float32)
        y1 = np.asarray(lz.sosfilt(sos8, x, block_size=1024))
        y2 = np.asarray(lz.sosfilt(sos8, x, block_size=8192))
        assert snr(y1, y2) >= 120.0
