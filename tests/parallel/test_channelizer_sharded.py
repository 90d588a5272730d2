"""Sharded channelizer == unsharded streaming (VERDICT r1 missing #6).

The flagship chain's `sharded_step` was previously verified only by the
driver dryrun; these tests pin the sharded==unsharded invariant on the
8-device CPU mesh (SURVEY.md §4.6) including state carry across
super-blocks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import llzlab_tpu as lz
from llzlab_tpu.chains.channelizer import Channelizer
from llzlab_tpu.parallel.mesh import make_dsp_mesh, CHANNEL_AXIS, TIME_AXIS


def _chan():
    # Small flagship: every collective (halo ppermute ×2, tail broadcast)
    # is exercised while block_multiple stays CPU-mesh-sized.
    return Channelizer(
        fir_taps=lz.firwin(256, 0.4),
        fft_n=128,
        taps_per_phase=16,
        fir_method="direct",
    )


def _run_sharded(chan, mesh, x, n_steps=1):
    c, t = x.shape
    chan.validate_sharded_shapes(mesh, c, t)
    step = chan.sharded_step(mesh)
    x_spec = NamedSharding(mesh, P(CHANNEL_AXIS, TIME_AXIS))
    st_spec = NamedSharding(mesh, P(CHANNEL_AXIS, None))
    xd = jax.device_put(jnp.asarray(x), x_spec)
    st = tuple(jax.device_put(s, st_spec) for s in chan.init_state(c))
    outs = []
    for _ in range(n_steps):
        spec, st = step(xd, st)
        outs.append(np.asarray(spec))
    return outs, st


def _run_streaming(chan, x, t_loc, n_steps=1):
    """Unsharded streaming reference at t_loc granularity."""
    c, t = x.shape
    st = chan.init_state(c)
    outs = []
    for _ in range(n_steps):
        frames = []
        for j in range(t // t_loc):
            spec, st = chan.step(
                jnp.asarray(x[:, j * t_loc : (j + 1) * t_loc]), st
            )
            frames.append(np.asarray(spec))
        outs.append(np.concatenate(frames, axis=1))
    return outs, st


@pytest.fixture(scope="module")
def chan():
    return _chan()


@pytest.fixture(scope="module")
def snr():
    def f(ref, y):
        ref = np.asarray(ref)
        y = np.asarray(y)
        e = np.abs(ref - y)
        return 10 * np.log10(np.sum(np.abs(ref) ** 2) / np.sum(e**2))

    return f


class TestChannelizerSharded:
    @pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
    def test_matches_unsharded_streaming(self, chan, mesh_shape, snr):
        nc, nt = mesh_shape
        mesh = make_dsp_mesh(nc, nt)
        m = chan.block_multiple()
        c, t = 2 * nc if nc > 1 else 4, m * nt
        rng = np.random.default_rng(77)
        x = rng.standard_normal((c, t)).astype(np.float32)
        (spec_sh,), _ = _run_sharded(chan, mesh, x)
        (spec_ref,), _ = _run_streaming(chan, x, m)
        assert spec_sh.shape == spec_ref.shape
        # FIR/resample locals are bit-exact vs streaming; the rfft frames
        # go through the same local shapes — require >=140 dB (complex).
        assert snr(spec_ref, spec_sh) >= 140.0

    def test_state_carry_across_superblocks(self, chan, snr):
        mesh = make_dsp_mesh(2, 4)
        m = chan.block_multiple()
        c, t = 4, m * 4
        rng = np.random.default_rng(78)
        x = rng.standard_normal((c, t)).astype(np.float32)
        outs_sh, st_sh = _run_sharded(chan, mesh, x, n_steps=2)
        outs_ref, st_ref = _run_streaming(chan, x, m, n_steps=2)
        # Super-block 2 consumed the carried state — it must still match.
        assert snr(outs_ref[1], outs_sh[1]) >= 140.0
        for a, b in zip(st_sh, st_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=0
            )

    def test_spec_energy_is_finite_and_nonzero(self, chan):
        mesh = make_dsp_mesh(1, 8)
        m = chan.block_multiple()
        rng = np.random.default_rng(79)
        x = rng.standard_normal((4, m * 8)).astype(np.float32)
        (spec,), _ = _run_sharded(chan, mesh, x)
        e = np.abs(spec).sum()
        assert np.isfinite(e) and e > 0


class TestChannelizerFusedSharded:
    """fir_method='fused' under shard_map: ONE 2·block halo replaces the
    FIR+resampler pair; sharded == unsharded streaming (VERDICT r2 #2)."""

    def _chan_fused(self):
        return Channelizer(
            fir_taps=lz.firwin(256, 0.4),
            up=3,
            down=4,
            fft_n=128,
            taps_per_phase=8,
            fir_method="fused",
        )

    @pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
    def test_matches_unsharded_streaming(self, mesh_shape, snr):
        chan = self._chan_fused()
        nc, nt = mesh_shape
        mesh = make_dsp_mesh(nc, nt)
        m = chan.block_multiple()
        c, t = 8, m * nt  # local C = 8/nc: kernel path at nc=1, fallback at nc=2
        rng = np.random.default_rng(81)
        x = rng.standard_normal((c, t)).astype(np.float32)
        (spec_sh,), st_sh = _run_sharded(chan, mesh, x)
        (spec_ref,), st_ref = _run_streaming(chan, x, m)
        assert spec_sh.shape == spec_ref.shape
        assert snr(spec_ref, spec_sh) >= 110.0
        np.testing.assert_allclose(
            np.asarray(st_sh[0]), np.asarray(st_ref[0]), rtol=0, atol=0)

    def test_superblock_carry(self, snr):
        chan = self._chan_fused()
        mesh = make_dsp_mesh(1, 8)
        m = chan.block_multiple()
        c, t = 8, m * 8
        rng = np.random.default_rng(82)
        x = rng.standard_normal((c, t)).astype(np.float32)
        outs_sh, _ = _run_sharded(chan, mesh, x, n_steps=2)
        outs_ref, _ = _run_streaming(chan, x, m, n_steps=2)
        assert snr(outs_ref[1], outs_sh[1]) >= 110.0


class TestChannelizerRdmaHalo:
    """halo='rdma' (Pallas make_async_remote_copy, 1-D time mesh) must
    reproduce the ppermute path exactly (VERDICT r1 item 7)."""

    def test_rdma_matches_ppermute(self, chan, snr):
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[:8]), (TIME_AXIS,))
        m = chan.block_multiple()
        c, t = 4, m * 8
        rng = np.random.default_rng(80)
        x = rng.standard_normal((c, t)).astype(np.float32)
        (a,), _ = _run_sharded_1d(chan, mesh, x, halo="rdma")
        (b,), _ = _run_sharded_1d(chan, mesh, x, halo="ppermute")
        np.testing.assert_array_equal(a, b)

    def test_rdma_rejects_2d_mesh(self, chan):
        mesh = make_dsp_mesh(2, 4)
        with pytest.raises(ValueError, match="1-D"):
            chan.sharded_step(mesh, halo="rdma")


def _run_sharded_1d(chan, mesh, x, halo):
    c, t = x.shape
    chan.validate_sharded_shapes(mesh, c, t)
    step = chan.sharded_step(mesh, halo=halo)
    x_spec = NamedSharding(mesh, P(None, TIME_AXIS))
    st_spec = NamedSharding(mesh, P(None, None))
    xd = jax.device_put(jnp.asarray(x), x_spec)
    st = tuple(jax.device_put(s, st_spec) for s in chan.init_state(c))
    spec, st = step(xd, st)
    return [np.asarray(spec)], st
