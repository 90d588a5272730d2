"""A2A reshard (Ulysses analog) invariants on the CPU mesh (SURVEY.md §2d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from llzlab_tpu.parallel.mesh import CHANNEL_AXIS, TIME_AXIS, make_dsp_mesh
from llzlab_tpu.parallel import reshard as rs


@pytest.fixture(scope="module")
def mesh24():
    return make_dsp_mesh(2, 4)


class TestReshard:
    def test_roundtrip_identity(self, mesh24):
        rng = np.random.default_rng(141)
        x_np = rng.standard_normal((8, 1024)).astype(np.float32)
        x = jax.device_put(
            jnp.asarray(x_np),
            NamedSharding(mesh24, P(CHANNEL_AXIS, TIME_AXIS)),
        )

        @jax.jit
        def round(v):
            cm = rs.to_channel_major(v, mesh24)
            return rs.to_time_major(cm, mesh24)

        np.testing.assert_array_equal(np.asarray(round(x)), x_np)

    def test_channel_major_sharding(self, mesh24):
        x = jax.device_put(
            jnp.arange(8 * 1024, dtype=jnp.float32).reshape(8, 1024),
            NamedSharding(mesh24, P(CHANNEL_AXIS, TIME_AXIS)),
        )
        cm = jax.jit(lambda v: rs.to_channel_major(v, mesh24))(x)
        # every shard now holds full time for one channel (8 ch / 8 dev)
        shard = cm.addressable_shards[0]
        assert shard.data.shape == (1, 1024)

    def test_values_preserved(self, mesh24):
        rng = np.random.default_rng(142)
        x_np = rng.standard_normal((16, 512)).astype(np.float32)
        x = jax.device_put(
            jnp.asarray(x_np),
            NamedSharding(mesh24, P(CHANNEL_AXIS, TIME_AXIS)),
        )
        cm = jax.jit(lambda v: rs.to_channel_major(v, mesh24))(x)
        np.testing.assert_array_equal(np.asarray(cm), x_np)

    def test_shard_map_a2a_matches(self, mesh24):
        rng = np.random.default_rng(143)
        x_np = rng.standard_normal((8, 1024)).astype(np.float32)
        x = jax.device_put(
            jnp.asarray(x_np),
            NamedSharding(mesh24, P(CHANNEL_AXIS, TIME_AXIS)),
        )
        out = rs.all_to_all_shard_map(x, mesh24)
        np.testing.assert_array_equal(np.asarray(out), x_np)
