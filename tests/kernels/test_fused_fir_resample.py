"""Fused FIR+resample Pallas kernel vs the unfused op chain (interpret mode).

SURVEY.md §4.3: Pallas kernel vs its jnp reference path on random blocks,
plus the streaming split invariant (§4.2).
"""

import numpy as np
import pytest
import scipy.signal as ss

import jax.numpy as jnp

from llzlab_tpu.kernels import fused_fir_resample as ff
from llzlab_tpu.ops import fir as fir_mod
from llzlab_tpu.ops import resample as rs_mod
from tests.conftest import snr_db

NTAPS, UP, DOWN, K = 129, 3, 4, 8


def _setup(rng, b=8, nprog=2):
    taps = fir_mod.firwin(NTAPS, 0.2, window="hamming")
    rtaps = rs_mod.resample_taps(UP, DOWN, K)
    p = ff.fused_program_in(NTAPS, UP, DOWN)
    t = nprog * p
    x = rng.standard_normal((b, t)).astype(np.float32)
    return taps, rtaps, x


def test_program_geometry():
    p = ff.fused_program_in(NTAPS, UP, DOWN)
    assert p % DOWN == 0
    assert (p // DOWN) * UP % 128 == 0
    assert p % (2 * fir_mod.block2_block(NTAPS)) == 0
    assert ff.fused_supports(8, NTAPS, UP, DOWN, K, 2 * p)
    assert not ff.fused_supports(7, NTAPS, UP, DOWN, K, 2 * p)
    assert not ff.fused_supports(8, NTAPS, UP, DOWN, K, 2 * p + 1)
    # headline chain: 1024 taps, 147/160, 64 taps/phase
    p_head = ff.fused_program_in(1024, 147, 160)
    assert p_head == 20480
    assert ff.fused_supports(64, 1024, 147, 160, 64, 245760)


@pytest.mark.parametrize("mode", ["highest", "high"])
def test_fused_matches_unfused_and_golden(rng, mode):
    taps, rtaps, x = _setup(rng)
    z = ff.fused_fir_resample_pallas(
        x, taps, UP, DOWN, rtaps, mode=mode, interpret=True
    )
    # golden: float64 serial scipy on channel 0 and last channel
    for c in (0, -1):
        y64 = ss.lfilter(taps, [1.0], x[c].astype(np.float64))
        z64 = ss.upfirdn(rtaps, y64, UP, DOWN)[: z.shape[-1]]
        floor = 110.0 if mode == "highest" else 80.0
        assert snr_db(z64, z[c]) >= floor
    # unfused op chain (same engine family)
    y = fir_mod.fir_filter(x, taps, method="block2")
    z_ref = rs_mod.resample_poly(y, UP, DOWN, taps=rtaps)
    assert z.shape == z_ref.shape
    assert snr_db(np.asarray(z_ref, np.float64), z) >= (
        130.0 if mode == "highest" else 75.0
    )


def test_streaming_split_bitexact(rng):
    """Splitting at any program boundary and carrying zf reproduces the
    one-shot output bit-for-bit (same operands, same tile order)."""
    taps, rtaps, x = _setup(rng, nprog=3)
    p = ff.fused_program_in(NTAPS, UP, DOWN)
    z_full = ff.fused_fir_resample_pallas(
        x, taps, UP, DOWN, rtaps, mode="highest", interpret=True
    )
    za, zf = ff.fused_fir_resample_pallas(
        x[:, :p], taps, UP, DOWN, rtaps, mode="highest", interpret=True,
        return_zf=True,
    )
    zb = ff.fused_fir_resample_pallas(
        x[:, p:], taps, UP, DOWN, rtaps, zi=zf, mode="highest",
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(z_full), np.concatenate([za, zb], axis=-1)
    )


def test_state_len_matches_history_reach():
    h = ff.fused_state_len(NTAPS)
    block = fir_mod.block2_block(NTAPS)
    assert h == 2 * block
    # history must cover (K−1) resample lookback + (ntaps−1) FIR reach
    assert h >= (K - 1) + (NTAPS - 1)


def test_v4_nw1_bitwise_equals_v3(rng):
    """ADVICE r4: pin the v4 (split-once) dataflow at nw=1 bitwise
    against v3 in interpret mode — only bench/r4_probe.py exercised it
    before."""
    taps, rtaps, x = _setup(rng)
    z3 = ff.fused_fir_resample_pallas(
        x, taps, UP, DOWN, rtaps, mode="highest", interpret=True,
        impl="v3")
    z4 = ff.fused_fir_resample_pallas(
        x, taps, UP, DOWN, rtaps, mode="highest", interpret=True,
        impl="v4", nw=1)
    np.testing.assert_array_equal(np.asarray(z3), np.asarray(z4))


def test_v4_explicit_incompatible_raises(rng):
    """ADVICE r4: an explicit impl='v4' that cannot run must raise, not
    silently downgrade to v3."""
    taps, rtaps, x = _setup(rng)
    with pytest.raises(ValueError, match="v4"):
        ff.fused_fir_resample_pallas(
            x, taps, UP, DOWN, rtaps, mode="highest", interpret=True,
            impl="v4", wide=True)
    nt = fir_mod.block2_block(NTAPS) // 128
    with pytest.raises(ValueError, match="v4"):
        ff.fused_fir_resample_pallas(
            x, taps, UP, DOWN, rtaps, mode="highest", interpret=True,
            impl="v4", nw=nt + 3)


def test_stage_pallas_rejects_bad_batch(rng):
    """ADVICE r4: FusedFirResampleStage with engine='pallas' must fail
    with a clear message when the runtime batch is not a multiple of 8,
    not an opaque kernel-tile error downstream."""
    from llzlab_tpu.pipeline.chain import FusedFirResampleStage

    taps = fir_mod.firwin(NTAPS, 0.2, window="hamming")
    stage = FusedFirResampleStage(taps, UP, DOWN, taps_per_phase=K,
                                  engine="pallas")
    p = ff.fused_program_in(NTAPS, UP, DOWN)
    x = rng.standard_normal((5, p)).astype(np.float32)
    with pytest.raises(ValueError, match="channels"):
        stage.apply(jnp.asarray(x), stage.init_state((5,)))
