"""Pallas TPU kernel: fused biquad-cascade scan as triangular matmuls.

The XLA ``associative_scan`` path (ops/iir.py) materialises per-section
state arrays in HBM (≥2·ns full passes over the signal), and a naive
in-kernel Kogge–Stone needs log2(L) cross-lane rolls per section — VPU
shuffles, the slowest thing a TPU does.  This kernel instead puts the
scan on the MXU:

With the block reshaped to (rows R, lanes 128) and section pole p:

  1. intra-row scan  = one complex matmul with the constant triangular
     matrix  T[j, k] = p^(k−j)·[k ≥ j]                  (128×128, MXU)
  2. row entry states E_r = q^r·s_in + Σ_{r'<r} q^(r−1−r')·e_{r'} with
     q = p^128 — one tiny (R×R) triangular matmul over the row ends
  3. carry injection  w[r, k] += p^(k+1)·E_r            (elementwise)
  4. y[n] = b0·x[n] + c1·Re(w[n−1]) + c2·Im(w[n−1]) — w_prev via one
     single-lane roll + E_r at lane 0

All 8 sections run VMEM-resident on one (B_tile, L) block: one HBM read
of x, one write of y.  Constants are f64-derived on host.  Streaming
state (coupled-form (wr, wi) per section) lives in VMEM scratch across
the sequential grid — bit-stable blockwise semantics, same contract as
ops.sosfilt.

Coupled (Gold–Rader) realization only — ops.iir falls back to the XLA
scan for real-pole sections.
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

_LANE = 128


def supports(sos) -> bool:
    """True iff every section has complex poles (coupled realization)."""
    kinds, _ = _iir.sos_plan(sos)
    return all(k == "coupled" for k in kinds)


def _section_tables(sos_np: np.ndarray, L: int):
    """Host-side f64-derived constants per section.

    Returns (coeffs, tri, rowq, inj) where, per section s with pole p:
      tri[s]  (128, 128, 2): T[j,k] = p^(k−j) for k ≥ j else 0
      rowq[s] (R, R, 2):     Q[r',r] = q^(r−1−r') for r' < r else 0, q=p^128
      qpow[s] (R, 2):        q^r  (carry-in weight per row)
      inj[s]  (128, 2):      p^(k+1) (carry injection within a row)
      coeffs[s] = (c1, c2, b0)
    """
    ns = sos_np.shape[0]
    R = L // _LANE
    tri = np.zeros((ns, _LANE, _LANE, 2), np.float32)
    rowq = np.zeros((ns, R, R, 2), np.float32)
    qpow = np.zeros((ns, R, 2), np.float32)
    inj = np.zeros((ns, _LANE, 2), np.float32)
    coeffs = []
    for s in range(ns):
        kind, prm = _iir.section_realization(sos_np[s])
        if kind != "coupled":
            raise ValueError("pallas biquad kernel requires complex poles")
        alpha, beta, c1, c2, b0 = (float(v) for v in prm)
        p = complex(alpha, beta)
        k = np.arange(_LANE)
        expo = k[None, :] - k[:, None]
        Tm = np.where(expo >= 0, np.power(p, np.clip(expo, 0, None)), 0.0)
        tri[s, :, :, 0] = Tm.real
        tri[s, :, :, 1] = Tm.imag
        q = p ** _LANE
        r = np.arange(R)
        eq = (r[None, :] - 1) - r[:, None]  # Q[r', r] exponent
        Qm = np.where(eq >= 0, np.power(q, np.clip(eq, 0, None)), 0.0)
        rowq[s, :, :, 0] = Qm.real
        rowq[s, :, :, 1] = Qm.imag
        qr = np.power(q, r)
        qpow[s, :, 0] = qr.real
        qpow[s, :, 1] = qr.imag
        pk = np.power(p, k + 1)
        inj[s, :, 0] = pk.real
        inj[s, :, 1] = pk.imag
        coeffs.append((c1, c2, b0))
    return coeffs, tri, rowq, qpow, inj


def _dot(a, b):
    """Contract last dim of a with first of b (MXU, full f32)."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel(coeffs, L, nblocks, zf_idx, x_ref, zi_ref, tri_ref, rowq_ref,
            qpow_ref, inj_ref, y_ref, zf_ref, carry):
    # Blocks arrive pre-shaped (bt, R, 128): rows on sublanes, samples on
    # lanes — no in-kernel relayout (a (bt, L)→(bt·R, 128) reshape would
    # be a cross-tile shuffle in Mosaic).
    t = pl.program_id(1)
    bt = x_ref.shape[0]
    R = L // _LANE
    zf_r, zf_k = zf_idx // _LANE, zf_idx % _LANE

    @pl.when(t == 0)
    def _():
        carry[:] = zi_ref[:]

    y_ref[:] = x_ref[:]
    for s, (c1, c2, b0) in enumerate(coeffs):
        u = y_ref[:]  # (bt, R, 128) section input, real
        # 1. intra-row inclusive scan via triangular matmul (complex out).
        wr = _dot(u, tri_ref[s, :, :, 0])  # (bt, R, 128)
        wi = _dot(u, tri_ref[s, :, :, 1])
        # 2. row entry states from zero-init row ends e_r = w[., ., last].
        er = wr[:, :, _LANE - 1]  # (bt, R)
        ei = wi[:, :, _LANE - 1]
        Er = _dot(er, rowq_ref[s, :, :, 0]) - _dot(ei, rowq_ref[s, :, :, 1])
        Ei = _dot(er, rowq_ref[s, :, :, 1]) + _dot(ei, rowq_ref[s, :, :, 0])
        cr = carry[:, s, 0][:, None]  # stream carry-in (bt, 1)
        ci = carry[:, s, 1][:, None]
        qpr = qpow_ref[s, :, 0][None, :]
        qpi = qpow_ref[s, :, 1][None, :]
        Er = Er + qpr * cr - qpi * ci  # (bt, R)
        Ei = Ei + qpr * ci + qpi * cr
        # 3. inject row entries within each row: w += p^(k+1)·E_r.
        ijr = inj_ref[s, :, 0][None, None, :]  # (1, 1, 128)
        iji = inj_ref[s, :, 1][None, None, :]
        Er3 = Er[:, :, None]
        Ei3 = Ei[:, :, None]
        w3r = wr + ijr * Er3 - iji * Ei3
        w3i = wi + ijr * Ei3 + iji * Er3
        # 4. w_prev: lane-roll by one; lane 0 takes E_r.
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, R, _LANE), 2)
        first = lane < 1
        wpr = jnp.where(first, Er3, pltpu.roll(w3r, 1, axis=2))
        wpi = jnp.where(first, Ei3, pltpu.roll(w3i, 1, axis=2))
        # stream carry out = state after the block's last sample.
        carry[:, s, 0] = w3r[:, R - 1, _LANE - 1]
        carry[:, s, 1] = w3i[:, R - 1, _LANE - 1]

        @pl.when(t == nblocks - 1)
        def _(s=s, w3r=w3r, w3i=w3i):
            zf_ref[:, s, 0] = w3r[:, zf_r, zf_k]
            zf_ref[:, s, 1] = w3i[:, zf_r, zf_k]

        y_ref[:] = b0 * y_ref[:] + c1 * wpr + c2 * wpi


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

    Requires all-complex-pole ``sos`` (see :func:`supports`); pads T to a
    multiple of ``block_size`` (itself a multiple of 128) internally.
    ``zi``/``zf`` use the same opaque coupled-state layout as
    :func:`llzlab_tpu.ops.iir.sosfilt`.
    """
    sos_np = np.asarray(sos, np.float64)
    ns = sos_np.shape[0]
    L = int(block_size)
    if L % _LANE:
        raise ValueError(f"block_size must be a multiple of {_LANE}")
    coeffs, tri, rowq, qpow, inj = _section_tables(sos_np, L)
    R = L // _LANE

    shape = x.shape
    t = shape[-1]
    xb = x.reshape(-1, t).astype(jnp.float32)
    b = xb.shape[0]
    bt = min(batch_tile, b)
    while b % bt:
        bt -= 1
    pad_t = (-t) % L
    xp = jnp.pad(xb, ((0, 0), (0, pad_t)))
    tp = t + pad_t
    nblocks = tp // L
    if zi is None:
        zi_b = jnp.zeros((b, ns, 2), jnp.float32)
    else:
        zi_b = jnp.asarray(zi).reshape(b, ns, 2).astype(jnp.float32)

    kern = functools.partial(_kernel, coeffs, L, nblocks, (t - 1) % L)
    grid = (b // bt, nblocks)
    x3 = xp.reshape(b, tp // _LANE, _LANE)  # free view: rows × lanes
    y, zf = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, R, _LANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ns, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, _LANE, _LANE, 2),
                         lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, R, R, 2),
                         lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, R, 2),
                         lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, _LANE, 2),
                         lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, R, _LANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ns, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tp // _LANE, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((b, ns, 2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bt, ns, 2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x3, zi_b, jnp.asarray(tri), jnp.asarray(rowq), jnp.asarray(qpow),
      jnp.asarray(inj))
    y = y.reshape(b, tp)[:, :t].reshape(shape).astype(x.dtype)
    zf = zf.reshape(shape[:-1] + (ns, 2))
    return y, zf
