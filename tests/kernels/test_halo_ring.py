"""RDMA ring halo kernel vs ppermute fallback (interpret mode, 1-D mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from llzlab_tpu.kernels.halo_ring import left_halo_ring
from llzlab_tpu.parallel.halo import left_halo
from llzlab_tpu.parallel.mesh import TIME_AXIS


@pytest.fixture(scope="module")
def mesh_t8():
    return Mesh(np.asarray(jax.devices()[:8]), (TIME_AXIS,))


def _run(mesh, fn):
    return jax.shard_map(
        fn, mesh=mesh, in_specs=P(None, TIME_AXIS),
        out_specs=P(None, TIME_AXIS), check_vma=False,
    )


class TestHaloRing:
    def test_matches_ppermute(self, mesh_t8):
        rng = np.random.default_rng(171)
        x = rng.standard_normal((4, 8 * 256)).astype(np.float32)
        a = np.asarray(_run(mesh_t8, lambda v: left_halo_ring(
            v, 16, axis_names=(TIME_AXIS,), interpret=True))(jnp.asarray(x)))
        b = np.asarray(_run(mesh_t8, lambda v: left_halo(v, 16))(
            jnp.asarray(x)))
        np.testing.assert_array_equal(a, b)

    def test_stream_carry_enters_shard0(self, mesh_t8):
        rng = np.random.default_rng(172)
        x = rng.standard_normal((2, 8 * 128)).astype(np.float32)
        carry = rng.standard_normal((2, 8)).astype(np.float32)

        def fn(v):
            return left_halo_ring(
                v, 8, axis_names=(TIME_AXIS,),
                first_shard_value=jnp.asarray(carry), interpret=True,
            )

        out = np.asarray(_run(mesh_t8, fn)(jnp.asarray(x)))
        np.testing.assert_array_equal(out[:, :8], carry)
        # shard 1 received shard 0's tail
        np.testing.assert_array_equal(out[:, 8:16], x[:, 128 - 8 : 128])

    def test_ppermute_fallback_flag(self, mesh_t8):
        rng = np.random.default_rng(173)
        x = rng.standard_normal((2, 8 * 128)).astype(np.float32)
        a = np.asarray(_run(mesh_t8, lambda v: left_halo_ring(
            v, 8, use_rdma=False))(jnp.asarray(x)))
        b = np.asarray(_run(mesh_t8, lambda v: left_halo(v, 8))(
            jnp.asarray(x)))
        np.testing.assert_array_equal(a, b)
