"""Tap-TP and stage-PP strategies on the CPU mesh (SURVEY.md §2d)."""

import numpy as np
import jax.numpy as jnp
import pytest

import llzlab_tpu as lz
from llzlab_tpu.parallel.mesh import make_dsp_mesh
from llzlab_tpu.parallel.stage_pp import make_stage_mesh, stage_pipeline
from llzlab_tpu.parallel.tap_tp import fir_filter_tap_parallel


class TestTapTP:
    def test_matches_unsharded(self, snr):
        mesh = make_dsp_mesh(1, 8)
        rng = np.random.default_rng(151)
        taps = lz.firwin(1024, 0.25)
        x = rng.standard_normal((4, 8192)).astype(np.float32)
        y_tp = np.asarray(fir_filter_tap_parallel(jnp.asarray(x), taps, mesh))
        y_ref = np.asarray(lz.fir_filter(x, taps, method="direct"))
        assert snr(y_ref, y_tp) >= 120.0

    def test_uneven_tap_split(self, snr):
        mesh = make_dsp_mesh(1, 8)
        rng = np.random.default_rng(152)
        taps = lz.firwin(1000, 0.3)  # not divisible by 8
        x = rng.standard_normal((2, 4096)).astype(np.float32)
        y_tp = np.asarray(fir_filter_tap_parallel(jnp.asarray(x), taps, mesh))
        y_ref = np.asarray(lz.fir_filter(x, taps, method="direct"))
        assert snr(y_ref, y_tp) >= 120.0


class TestStagePP:
    def test_matches_serial_composition(self, snr):
        mesh = make_stage_mesh(4)
        rng = np.random.default_rng(153)
        x = rng.standard_normal((4, 8 * 512)).astype(np.float32)
        fns = [
            lambda v: v * 0.5,
            lambda v: v + 0.25,
            lambda v: jnp.tanh(v),
            lambda v: v * 2.0,
        ]
        y_pp = np.asarray(
            stage_pipeline(fns, mesh, jnp.asarray(x), micro_block=512)
        )
        y_ref = x.copy()
        for f in fns:
            y_ref = np.asarray(f(jnp.asarray(y_ref)))
        assert snr(y_ref, y_pp) >= 140.0

    def test_two_stage_filters(self, snr):
        """Blockwise stateless FIR stages (short taps, per-block zero
        history) — pipeline equals serial blockwise composition."""
        mesh = make_stage_mesh(2)
        rng = np.random.default_rng(154)
        taps_a = lz.firwin(33, 0.4)
        taps_b = lz.firwin(17, 0.6, pass_zero=False)
        x = rng.standard_normal((2, 6 * 1024)).astype(np.float32)

        def fa(v):
            return lz.fir_filter(v, taps_a, method="direct")

        def fb(v):
            return lz.fir_filter(v, taps_b, method="direct")

        y_pp = np.asarray(
            stage_pipeline([fa, fb], mesh, jnp.asarray(x), micro_block=1024)
        )
        ref = x.reshape(2, 6, 1024)
        out = np.zeros_like(ref)
        for i in range(6):
            out[:, i] = np.asarray(fb(fa(jnp.asarray(ref[:, i]))))
        # switch-wrapped conv compiles with different FMA contraction than
        # the standalone op → uniform ~1e-7 noise, not a logic error
        assert snr(out.reshape(2, -1), y_pp) >= 85.0
