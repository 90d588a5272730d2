"""Core invariants on the REAL chip (VERDICT r1 item 6; SURVEY.md §4.4).

The CPU suite verifies semantics; this ~2-min tier re-checks the
numerics that depend on TPU-specific lowering: MXU matmul precision
tiers, the Pallas kernels compiled by Mosaic (non-interpret), and the
streaming contracts of the dispatched fast paths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.signal as ss

import llzlab_tpu as lz
from llzlab_tpu.runtime.platform import fetch

pytestmark = pytest.mark.tpu


def _snr(ref, y):
    ref = np.asarray(ref)
    y = np.asarray(y)
    e = np.abs(ref - y)
    return 10 * np.log10(np.sum(np.abs(ref) ** 2) / np.sum(e**2))


@pytest.fixture(scope="module")
def x64ch():
    rng = np.random.default_rng(3)
    return rng.standard_normal((64, 61440)).astype(np.float32)


class TestTransformTPU:
    def test_fft_snr(self, x64ch):
        n = 2048
        xf = jnp.asarray(x64ch[:, :n])
        ours = fetch(lz.rfft(xf, n))  # complex D2H needs the tunnel-safe split
        ref = np.fft.rfft(x64ch[:, :n].astype(np.float64), n, axis=-1)
        assert _snr(ref, ours) > 110.0


class TestFirTPU:
    def test_block2_pallas_dispatch_and_streaming(self, x64ch):
        """method='block2' on TPU dispatches the Pallas kernel (64ch is
        inside the supports() envelope); its zi/zf streaming must split
        exactly at block granularity."""
        taps = lz.firwin(1024, 0.25)
        x = jnp.asarray(x64ch)
        full = np.asarray(lz.fir_filter(x, taps, method="block2"))
        cut = 30720  # multiple of block=1024
        a, zf = lz.fir_filter(x[:, :cut], taps, method="block2",
                              return_zf=True)
        b = lz.fir_filter(x[:, cut:], taps, method="block2", zi=zf)
        stitched = np.concatenate([np.asarray(a), np.asarray(b)], -1)
        np.testing.assert_array_equal(stitched, full)
        ref = ss.lfilter(taps, [1.0], x64ch[:2].astype(np.float64), axis=-1)
        assert _snr(ref, full[:2]) > 95.0  # bf16x3+ tier on MXU

    def test_ols_snr(self, x64ch):
        taps = lz.firwin(1024, 0.25)
        y = np.asarray(lz.fir_filter(jnp.asarray(x64ch[:4]), taps,
                                     method="ols"))
        ref = ss.lfilter(taps, [1.0], x64ch[:4].astype(np.float64), axis=-1)
        assert _snr(ref, y) > 80.0


class TestFusedChainTPU:
    def test_fused_kernel_matches_golden_and_streams(self, x64ch):
        from llzlab_tpu.kernels import fused_fir_resample as ff

        taps = lz.firwin(1024, 0.25)
        rtaps = lz.resample_taps(147, 160, 64)
        k = len(rtaps) // 147
        t = 40960  # 2 programs of P=20480
        assert ff.fused_supports(64, 1024, 147, 160, k, t)
        x = jnp.asarray(x64ch[:, :t])
        z, zf = ff.fused_fir_resample_pallas(
            x, taps, 147, 160, rtaps, return_zf=True, mode="high")
        y64 = ss.lfilter(taps, [1.0], x64ch[0, :t].astype(np.float64))
        ref = ss.upfirdn(rtaps, y64, 147, 160)[: z.shape[-1]]
        assert _snr(ref, np.asarray(z)[0]) > 95.0
        # streaming: two half-blocks with carried state == one shot
        h = t // 2
        a, zf1 = ff.fused_fir_resample_pallas(
            x[:, :h], taps, 147, 160, rtaps, return_zf=True, mode="high")
        b = ff.fused_fir_resample_pallas(
            x[:, h:], taps, 147, 160, rtaps, zi=zf1, mode="high")
        stitched = np.concatenate([np.asarray(a), np.asarray(b)], -1)
        np.testing.assert_array_equal(stitched, np.asarray(z))


class TestIirTPU:
    def test_sosfilt_engines_vs_golden(self, x64ch):
        sos = lz.peaking_eq_sos(
            [100, 300, 700, 1500, 3000, 6000, 10000, 15000],
            [3, -4, 2, 5, -3, 4, -2, 3], 48000, q=1.0)
        x = jnp.asarray(x64ch[:, :49152])
        ref = ss.sosfilt(np.asarray(sos, np.float64),
                         x64ch[:2, :49152].astype(np.float64), axis=-1)
        y_scan = np.asarray(lz.sosfilt(sos, x, block_size=4096))[:2]
        assert _snr(ref, y_scan) > 125.0
        y_mm = np.asarray(lz.sosfilt_matmul(sos, x, precision="highest"))[:2]
        assert _snr(ref, y_mm) > 125.0
        y_auto = np.asarray(lz.sosfilt_auto(sos, x, min_snr_db=80.0))[:2]
        assert _snr(ref, y_auto) > 80.0


class TestResampleTPU:
    def test_resample_streaming_bit_exact(self, x64ch):
        rtaps = lz.resample_taps(147, 160, 64)
        t = 32000  # multiple of 160
        x = jnp.asarray(x64ch[:8, :t])
        full = np.asarray(lz.resample_poly(x, 147, 160, taps=rtaps))
        a, zf = lz.resample_poly(x[:, : t // 2], 147, 160, taps=rtaps,
                                 return_zf=True)
        b = lz.resample_poly(x[:, t // 2 :], 147, 160, taps=rtaps, zi=zf)
        stitched = np.concatenate([np.asarray(a), np.asarray(b)], -1)
        np.testing.assert_array_equal(stitched, full)


class TestR5EnginesTPU:
    def test_pair_rdft_matches_numpy(self, x64ch):
        """rfft_pair (the r5 channelizer frames engine) on the real
        chip at precision=high — Mosaic-free but precision-tier
        dependent."""
        from llzlab_tpu.ops.transform import precision_scope, rfft_pair

        n = 2048
        xf = jnp.asarray(x64ch[:, :n])
        with precision_scope("high"):
            out = np.asarray(rfft_pair(xf, n))
        h1 = n // 2 + 1
        got = out[..., :h1].astype(np.float64) + 1j * out[..., h1:]
        ref = np.fft.rfft(x64ch[:, :n].astype(np.float64), n, axis=-1)
        assert _snr(ref, got) > 90.0

    def test_cwola_stage_matches_f64_wola(self, x64ch):
        """SpectralGainStage auto on TPU resolves to cwola for a static
        gain; its streamed interior must match an f64 WOLA golden."""
        from llzlab_tpu.pipeline.chain import SpectralGainStage

        gain = np.linspace(1.0, 0.5, 1025).astype(np.float32)
        stage = SpectralGainStage(gain)
        assert stage.engine == "cwola"
        x = x64ch[:4, : 4 * 4096]
        st = stage.init_state((4,))
        ys = []
        for j in range(4):
            y, st = stage.apply(
                jnp.asarray(x[:, j * 4096 : (j + 1) * 4096]), st)
            ys.append(np.asarray(y))
        ys.append(np.asarray(stage.flush(st)))
        ys = np.concatenate(ys, axis=-1)
        # f64 one-shot WOLA golden (same framing; interior window)
        w = ss.get_window("hann", 2048).astype(np.float64)
        tt = x.shape[-1]
        nf = 1 + (tt - 2048) // 512
        idx = np.arange(2048) + 512 * np.arange(nf)[:, None]
        fr = x.astype(np.float64)[:, idx] * w
        spec = np.fft.rfft(fr, axis=-1) * gain
        syn = np.fft.irfft(spec, 2048, axis=-1) * w
        out_len = 2048 + (nf - 1) * 512
        ref = np.zeros((4, out_len))
        env = np.zeros(out_len)
        for i in range(nf):
            ref[:, i * 512 : i * 512 + 2048] += syn[:, i]
            env[i * 512 : i * 512 + 2048] += w * w
        ref = ref / np.maximum(env, 1e-8)
        cut = ys[:, stage.latency :]
        lo, hi = 2048 + 1536, out_len - 2 * 2048
        assert _snr(ref[:, lo:hi], cut[:, lo:hi]) > 110.0

    def test_size_aware_fft_auto_large(self, x64ch):
        """auto at 4096 (pack fwd / real inv) stays >= 90 dB on chip."""
        from llzlab_tpu.ops.transform import precision_scope

        n = 4096
        xf = jnp.asarray(x64ch[:, :n])
        with precision_scope("high"):
            s = lz.rfft(xf, n)
            y = np.asarray(lz.irfft(s, n))
        assert _snr(x64ch[:, :n], y) > 90.0
