"""Heartbeat failure-detection collective (SURVEY.md §5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from llzlab_tpu.parallel.mesh import make_dsp_mesh
from llzlab_tpu.runtime.health import Heartbeat, heartbeat


class TestHeartbeat:
    def test_basic_ok(self):
        mesh = make_dsp_mesh(2, 4)
        out = heartbeat(mesh)
        assert out["ok"] and out["devices"] == 8 and out["rtt_s"] >= 0

    def test_nan_payload_detected(self):
        mesh = make_dsp_mesh(2, 4)
        bad = jnp.full((8,), jnp.nan)
        assert heartbeat(mesh, bad)["ok"] is False

    def test_every_n(self):
        mesh = make_dsp_mesh(1, 8)
        hb = Heartbeat(mesh, every=3)
        results = [hb.tick() for _ in range(6)]
        assert [r is None for r in results] == [True, True, False] * 2

    def test_raises_on_nonfinite(self):
        mesh = make_dsp_mesh(1, 8)
        hb = Heartbeat(mesh, every=1)
        with pytest.raises(FloatingPointError):
            hb.tick(jnp.array([np.inf] * 8))
