"""Fused halo-exchange + block2 FIR kernel (kernels/halo_fir_fused.py).

The kernel's contract: concatenated shard outputs are BITWISE equal to
the unsharded banded block2 Pallas kernel on the full stream — the
exchange being overlapped with compute must not change a single bit
(operand-for-operand identical dot sequence).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

import llzlab_tpu as lz
from llzlab_tpu.kernels.block2_fir import block2_fir_pallas
from llzlab_tpu.kernels.halo_fir_fused import (
    block2_fir_halo_fused,
    halo_fused_supports,
)
from llzlab_tpu.parallel.mesh import TIME_AXIS


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), (TIME_AXIS,))


def _run(x, taps, hist, n, *, mode, use_rdma):
    mesh = _mesh(n)

    def local(x_l, hs):
        return block2_fir_halo_fused(
            x_l, taps, first_shard_value=hs, mode=mode,
            use_rdma=use_rdma, interpret=True,
        )

    f = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(None, TIME_AXIS), P(None, None)),
        out_specs=P(None, TIME_AXIS), check_vma=False,
    ))
    return np.asarray(f(jnp.asarray(x), jnp.asarray(hist)))


def _ref(x, taps, hist, block):
    """Unsharded banded Pallas kernel with a leading history block."""
    c = x.shape[0]
    h = len(np.asarray(taps)) - 1
    lead = jnp.concatenate(
        [jnp.zeros((c, block - h), jnp.float32), jnp.asarray(hist)], axis=1
    )
    xpad = jnp.concatenate([lead, jnp.asarray(x)], axis=1)
    y = block2_fir_pallas(xpad, taps, block, mode="high", interpret=True)
    return np.asarray(y)[:, : x.shape[1]]


class TestHaloFusedKernel:
    @pytest.mark.parametrize("use_rdma", [True, False])
    @pytest.mark.parametrize("n", [2, 4, 8])
    def test_bitwise_vs_unsharded(self, n, use_rdma):
        taps = lz.firwin(1024, 0.25, window="hamming")
        C, Tl = 8, 2048
        rng = np.random.default_rng(0)
        x = rng.standard_normal((C, Tl * n)).astype(np.float32)
        hist = rng.standard_normal((C, 1023)).astype(np.float32)
        y = _run(x, taps, hist, n, mode="high", use_rdma=use_rdma)
        yref = _ref(x, taps, hist, 1024)
        np.testing.assert_array_equal(y, yref)

    def test_zero_history_is_stream_start(self):
        taps = lz.firwin(512, 0.3)
        C, n, Tl = 4, 4, 1024
        rng = np.random.default_rng(1)
        x = rng.standard_normal((C, Tl * n)).astype(np.float32)
        mesh = _mesh(n)

        def local(x_l):
            return block2_fir_halo_fused(
                x_l, taps, mode="high", use_rdma=True, interpret=True
            )

        f = jax.jit(shard_map(
            local, mesh=mesh, in_specs=P(None, TIME_AXIS),
            out_specs=P(None, TIME_AXIS), check_vma=False,
        ))
        y = np.asarray(f(jnp.asarray(x)))
        import scipy.signal as ss

        ref = ss.lfilter(np.asarray(taps, np.float64), [1.0],
                         x.astype(np.float64), axis=-1)
        err = ref - y.astype(np.float64)
        snr = 10 * np.log10(np.sum(ref**2) / np.sum(err**2))
        assert snr >= 100.0

    def test_supports_envelope(self):
        assert halo_fused_supports(8, 1024, 4096)
        assert not halo_fused_supports(8, 1024, 1024)   # < 2 blocks
        assert not halo_fused_supports(8, 1024, 4097)   # ragged
        assert not halo_fused_supports(512, 1024, 4096)  # too many ch

    def test_rejects_bad_shape(self):
        taps = lz.firwin(1024, 0.25)
        mesh = _mesh(2)

        def local(x_l):
            return block2_fir_halo_fused(x_l, taps, interpret=True)

        f = shard_map(local, mesh=mesh, in_specs=P(None, TIME_AXIS),
                      out_specs=P(None, TIME_AXIS), check_vma=False)
        with pytest.raises(ValueError, match="unsupported shape"):
            jax.jit(f)(jnp.zeros((4, 2 * 1024), jnp.float32))  # 1 blk/shard
