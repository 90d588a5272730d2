"""Pallas TPU kernel: fused biquad-cascade parallel scan (SURVEY.md §2c.1).

The XLA ``associative_scan`` path (ops/iir.py) materialises per-section
state arrays in HBM — ≥ 2·ns full passes over the signal.  This kernel
keeps one (B_tile, L) time-block resident in VMEM and runs ALL sections'
scans in place: one HBM read of x, one HBM write of y, everything else
VPU work.  Streaming state (per-section coupled-form (wr, wi)) lives in a
VMEM scratch that persists across the sequential TPU grid, so the kernel
is the canonical blockwise computation — bit-stable streaming semantics
identical to the op-level contract.

Per section (coupled / Gold–Rader form, complex pole p = α+jβ):
    w[n] = p·w[n−1] + x[n]          (Kogge–Stone: log2(L) shift-mac passes,
                                     step constants p^(2^k) baked in)
    carry-in: w[n] += p^(n+1)·w_in  (static (L,) power table input)
    y[n] = b0·x[n] + c1·Re(w[n−1]) + c2·Im(w[n−1])

Real-pole (companion) sections are not supported here — ops.iir falls
back to the XLA scan for those (audio EQ/butterworth cascades are
complex-pole in practice).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llzlab_tpu.ops import iir as _iir

__all__ = ["sosfilt_pallas", "supports"]


def supports(sos) -> bool:
    """True iff every section has complex poles (coupled realization)."""
    kinds, _ = _iir.sos_plan(sos)
    return all(k == "coupled" for k in kinds)


def _section_constants(sos_np: np.ndarray, L: int):
    """Static per-section constants, f64-derived.

    Returns (params, ptab) where params[s] = (alpha, beta, c1, c2, b0,
    [p^(2^k) for k]) as python floats and ptab is the (ns, L, 2) f32
    carry-injection table P[s, n] = p_s^(n+1).
    """
    ns = sos_np.shape[0]
    logl = int(np.log2(L))
    assert 1 << logl == L
    params = []
    ptab = np.zeros((ns, L, 2), np.float32)
    for s in range(ns):
        kind, p = _iir.section_realization(sos_np[s])
        if kind != "coupled":
            raise ValueError("pallas biquad kernel requires complex poles")
        alpha, beta, c1, c2, b0 = (float(v) for v in p)
        pole = complex(alpha, beta)
        steps = []
        acc = pole
        for _ in range(logl):
            steps.append((float(acc.real), float(acc.imag)))
            acc = acc * acc
        powers = pole ** (np.arange(L, dtype=np.float64) + 1.0)
        ptab[s, :, 0] = powers.real.astype(np.float32)
        ptab[s, :, 1] = powers.imag.astype(np.float32)
        params.append((alpha, beta, c1, c2, b0, tuple(steps)))
    return params, ptab


def _kernel(params, L, nblocks, zf_idx, x_ref, zi_ref, ptab_ref, y_ref,
            zf_ref, carry, wr_s, wi_s):
    t = pl.program_id(1)
    bt = x_ref.shape[0]

    @pl.when(t == 0)
    def _():
        carry[:] = zi_ref[:]

    pos = jax.lax.broadcasted_iota(jnp.int32, (bt, L), dimension=1)
    y_ref[:] = x_ref[:]  # section input accumulates in place
    for s, (alpha, beta, c1, c2, b0, steps) in enumerate(params):
        # In-place scan buffers (scratch refs, reused across steps and
        # sections — keeps scoped-VMEM flat instead of one live SSA value
        # per unrolled Kogge–Stone step).
        wr_s[:] = y_ref[:]
        wi_s[:] = jnp.zeros((bt, L), jnp.float32)
        # Kogge–Stone inclusive scan: w[n] += p^(2^k) · w[n − 2^k].
        for k, (pr, pi) in enumerate(steps):
            sh = 1 << k
            valid = pos >= sh
            rr = jnp.where(valid, pltpu.roll(wr_s[:], sh, axis=1), 0.0)
            ri = jnp.where(valid, pltpu.roll(wi_s[:], sh, axis=1), 0.0)
            wr_new = wr_s[:] + pr * rr - pi * ri
            wi_new = wi_s[:] + pr * ri + pi * rr
            wr_s[:] = wr_new
            wi_s[:] = wi_new
        # Carry injection: w[n] += p^(n+1) · w_in  (exact affine update).
        cr = carry[:, s, 0][:, None]  # (B_tile, 1)
        ci = carry[:, s, 1][:, None]
        tr = ptab_ref[s, :, 0][None, :]
        ti = ptab_ref[s, :, 1][None, :]
        wr_s[:] = wr_s[:] + tr * cr - ti * ci
        wi_s[:] = wi_s[:] + tr * ci + ti * cr
        # w_prev: shift by one, position 0 takes the carry itself.
        first = pos < 1
        w_prev_r = jnp.where(first, cr, pltpu.roll(wr_s[:], 1, axis=1))
        w_prev_i = jnp.where(first, ci, pltpu.roll(wi_s[:], 1, axis=1))
        carry[:, s, 0] = wr_s[:, L - 1]
        carry[:, s, 1] = wi_s[:, L - 1]

        # Final stream state = w at the last *real* sample (t−1 may sit
        # inside a zero-padded tail block).
        @pl.when(t == nblocks - 1)
        def _(s=s):
            zf_ref[:, s, 0] = wr_s[:, zf_idx]
            zf_ref[:, s, 1] = wi_s[:, zf_idx]

        y_ref[:] = b0 * y_ref[:] + c1 * w_prev_r + c2 * w_prev_i


def sosfilt_pallas(
    sos,
    x: jnp.ndarray,
    *,
    zi: Optional[jnp.ndarray] = None,
    block_size: int = 2048,
    batch_tile: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused cascade filter: ``x (..., T)`` → ``(y, zf)``.

    Requires all-complex-pole ``sos`` (see :func:`supports`) and pads
    T to a multiple of ``block_size`` internally.  ``zi``/``zf`` use the
    same opaque coupled-state layout as :func:`llzlab_tpu.ops.iir.sosfilt`.
    """
    sos_np = np.asarray(sos, np.float64)
    ns = sos_np.shape[0]
    L = int(block_size)
    params, ptab = _section_constants(sos_np, L)

    shape = x.shape
    t = shape[-1]
    xb = x.reshape(-1, t).astype(jnp.float32)
    b = xb.shape[0]
    bt = min(batch_tile, b) if b % min(batch_tile, b) == 0 else 1
    while b % bt:
        bt -= 1
    pad_t = (-t) % L
    pad_b = 0
    xp = jnp.pad(xb, ((0, pad_b), (0, pad_t)))
    tp = t + pad_t
    nblocks = tp // L
    if zi is None:
        zi_b = jnp.zeros((b, ns, 2), jnp.float32)
    else:
        zi_b = jnp.asarray(zi).reshape(b, ns, 2).astype(jnp.float32)

    kern = functools.partial(_kernel, params, L, nblocks, (t - 1) % L)
    grid = (b // bt, nblocks)
    y, zf = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, L), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ns, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, L, 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, L), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ns, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tp), jnp.float32),
            jax.ShapeDtypeStruct((b, ns, 2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, ns, 2), jnp.float32),
            pltpu.VMEM((bt, L), jnp.float32),
            pltpu.VMEM((bt, L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, zi_b, jnp.asarray(ptab))
    y = y[:, :t].reshape(shape).astype(x.dtype)
    zf = zf.reshape(shape[:-1] + (ns, 2))
    return y, zf
