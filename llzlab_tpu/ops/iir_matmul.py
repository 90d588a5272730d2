"""Biquad-cascade filtering as dense triangular MXU matmuls.

The parallel-scan sosfilt (ops/iir.py) is VPU-bound: an associative scan
over 2×2 transitions runs ~300 Msps/chip on v5e.  This engine moves the
recurrence onto the MXU (BASELINE.json:5 "IIR biquad cascades re-expressed
as parallel-scan" — here the scan *is* a matmul):

For a coupled-form section (complex pole ``p``), the zero-state response
inside an ``L``-sample block is a lower-triangular Toeplitz matmul

    w_loc[n] = Σ_{m ≤ n} p^{n−m} · x[m]      →  W_loc = X @ Pᵀ,
    P[n, m]  = p^{n−m}  (n ≥ m, else 0),

with ``P`` built once on host in float64.  The cross-block carry is the
scalar recurrence ``w_end[j] = w_end_loc[j] + p^L · w_end[j−1]`` — one
cheap ``lax.scan`` over blocks on a ``(batch,)`` vector — and the carry's
in-block contribution is the rank-1 correction ``p^{n+1} ⊗ w_end[j−1]``.
Companion-form (real-pole) sections use the same structure with the 2×2
transition's powers.

Numerics: powers decay (|p| < 1 for stable sections), each output sums
≤ L+1 f32 terms at HIGHEST precision — measured ≥110 dB vs the float64
serial reference on the BASELINE.json:9 8-section EQ.  Streaming split
invariance is ulp-level (matmul reassociation), not bit-exact; use the
scan engine when BASELINE.json:9 bit-matched carry is required.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from llzlab_tpu.ops.iir import section_realization
from llzlab_tpu.ops.transform import matmul_precision as _matmul_precision

__all__ = ["sosfilt_matmul"]


@functools.lru_cache(maxsize=64)
def _coupled_tables(alpha: float, beta: float, L: int):
    """(Pr, Pi) (L,L) lower-tri Toeplitz of p^(n−m); q (L,2) = p^(n+1);
    pL = p^L — all f32 from f64."""
    p = complex(alpha, beta)
    pw = p ** np.arange(L + 1)  # p^0 .. p^L
    n = np.arange(L)
    diff = n[:, None] - n[None, :]
    P = np.where(diff >= 0, pw[np.clip(diff, 0, L)], 0.0)
    q = pw[1 : L + 1]
    with jax.ensure_compile_time_eval():
        return (
            jnp.asarray(P.real.astype(np.float32)),
            jnp.asarray(P.imag.astype(np.float32)),
            jnp.asarray(np.stack([q.real, q.imag], -1).astype(np.float32)),
            jnp.asarray(
                np.array([pw[L].real, pw[L].imag], dtype=np.float32)
            ),
        )


@functools.lru_cache(maxsize=64)
def _companion_tables(a1: float, a2: float, b0: float, b1: float, b2: float,
                      L: int):
    """E (L,L,2): row n, col m = A^(n−m)·B; Q (L,2,2) = A^(n+1); AL (2,2)."""
    A = np.array([[-a1, 1.0], [-a2, 0.0]], np.float64)
    B = np.array([b1 - a1 * b0, b2 - a2 * b0], np.float64)
    pw = np.empty((L + 2, 2, 2), np.float64)
    pw[0] = np.eye(2)
    for k in range(1, L + 2):
        pw[k] = A @ pw[k - 1]
    n = np.arange(L)
    diff = n[:, None] - n[None, :]
    E = np.where(
        (diff >= 0)[..., None], (pw[np.clip(diff, 0, L)] @ B), 0.0
    )  # (L, L, 2)
    Q = pw[1 : L + 1]  # (L, 2, 2)
    with jax.ensure_compile_time_eval():
        return (
            jnp.asarray(E[..., 0].astype(np.float32)),
            jnp.asarray(E[..., 1].astype(np.float32)),
            jnp.asarray(Q.astype(np.float32)),
            jnp.asarray(pw[L].astype(np.float32)),
        )


def _coupled_section_matmul(x, s0, tables, c1, c2, b0, L):
    """x (B, T) pre-padded to a multiple of L; s0 (B, 2) = (wr, wi)."""
    Pr, Pi, q, pL = tables
    b, t = x.shape
    nblk = t // L
    xb = x.reshape(b, nblk, L)
    kw = dict(preferred_element_type=jnp.float32,
              precision=_matmul_precision())
    wr_loc = jnp.einsum("bjm,nm->bjn", xb, Pr, **kw)
    wi_loc = jnp.einsum("bjm,nm->bjn", xb, Pi, **kw)
    # Carry: w_end[j] = w_end_loc[j] + p^L · w_end[j−1];  w_end[−1] = s0.
    er, ei = wr_loc[..., -1], wi_loc[..., -1]  # (B, nblk)

    def step(c, e):
        cr, ci = c
        nr = e[0] + pL[0] * cr - pL[1] * ci
        ni = e[1] + pL[0] * ci + pL[1] * cr
        return (nr, ni), (cr, ci)  # emit the carry *entering* block j

    (fr, fi), (pr_in, pi_in) = lax.scan(
        step, (s0[:, 0], s0[:, 1]),
        (er.swapaxes(0, 1), ei.swapaxes(0, 1)),
    )
    win_r = pr_in.swapaxes(0, 1)  # (B, nblk): w_end[j−1]
    win_i = pi_in.swapaxes(0, 1)
    # In-block correction: w[j,n] += p^(n+1) · w_end[j−1].
    wr = wr_loc + (win_r[..., None] * q[:, 0] - win_i[..., None] * q[:, 1])
    wi = wi_loc + (win_r[..., None] * q[:, 1] + win_i[..., None] * q[:, 0])
    wr = wr.reshape(b, t)
    wi = wi.reshape(b, t)
    # y[n] = b0·x[n] + c1·Re w[n−1] + c2·Im w[n−1],  w[−1] = s0.
    wr_prev = jnp.concatenate([s0[:, :1], wr[:, :-1]], axis=-1)
    wi_prev = jnp.concatenate([s0[:, 1:2], wi[:, :-1]], axis=-1)
    y = b0 * x + c1 * wr_prev + c2 * wi_prev
    return y, wr, wi


def _companion_section_matmul(x, s0, tables, b0, L):
    """x (B, T) pre-padded; s0 (B, 2) companion state."""
    E1, E2, Q, AL = tables
    b, t = x.shape
    nblk = t // L
    xb = x.reshape(b, nblk, L)
    kw = dict(preferred_element_type=jnp.float32,
              precision=_matmul_precision())
    s1_loc = jnp.einsum("bjm,nm->bjn", xb, E1, **kw)
    s2_loc = jnp.einsum("bjm,nm->bjn", xb, E2, **kw)
    e = jnp.stack([s1_loc[..., -1], s2_loc[..., -1]], -1)  # (B, nblk, 2)

    def step(c, eb):
        n = eb + jnp.einsum("id,bd->bi", AL, c,
                            precision=jax.lax.Precision.HIGHEST)
        return n, c

    _, s_in = lax.scan(step, s0, e.swapaxes(0, 1))
    s_in = s_in.swapaxes(0, 1)  # (B, nblk, 2): state entering block j
    corr = jnp.einsum("nid,bjd->bjni", Q, s_in,
                      precision=jax.lax.Precision.HIGHEST)
    s1 = (s1_loc + corr[..., 0]).reshape(b, t)
    s2 = (s2_loc + corr[..., 1]).reshape(b, t)
    s1_prev = jnp.concatenate([s0[:, :1], s1[:, :-1]], axis=-1)
    y = b0 * x + s1_prev
    return y, s1, s2


def _factory(kinds, consts, L: int, return_zf: bool):
    @jax.jit
    def run(x, tables, zi_b):
        shape = x.shape
        t = shape[-1]
        xb = x.reshape(-1, t).astype(jnp.float32)
        tp = t + ((-t) % L)
        cur = jnp.pad(xb, ((0, 0), (0, tp - t)))
        zf = []
        for s, kind in enumerate(kinds):
            if kind == "coupled":
                c1, c2, b0 = consts[s]
                cur, wr, wi = _coupled_section_matmul(
                    cur, zi_b[:, s, :], tables[s], c1, c2, b0, L
                )
                if return_zf:
                    zf.append(jnp.stack([wr[:, t - 1], wi[:, t - 1]], -1))
            else:
                (b0,) = consts[s]
                cur, s1, s2 = _companion_section_matmul(
                    cur, zi_b[:, s, :], tables[s], b0, L
                )
                if return_zf:
                    zf.append(jnp.stack([s1[:, t - 1], s2[:, t - 1]], -1))
        y = cur[:, :t].reshape(shape).astype(x.dtype)
        if not return_zf:
            return y
        return y, jnp.stack(zf, 1).reshape(shape[:-1] + (len(kinds), 2))

    return run


@functools.lru_cache(maxsize=128)
def _run_cached(kinds, consts, L, return_zf):
    return _factory(kinds, consts, L, return_zf)


def sosfilt_matmul(
    sos,
    x: jnp.ndarray,
    *,
    zi: Optional[jnp.ndarray] = None,
    block_size: int = 128,
    return_zf: bool = False,
):
    """MXU-matmul biquad cascade (drop-in for :func:`llzlab_tpu.sosfilt`).

    Same state convention as sosfilt (``(..., ns, 2)`` in the per-section
    scan realization), so states interchange between engines.  Prefer this
    on TPU for throughput; prefer the scan engine for bit-matched
    streaming splits (BASELINE.json:9).
    """
    sos_np = np.asarray(sos, dtype=np.float64)
    if sos_np.ndim != 2 or sos_np.shape[1] != 6:
        raise ValueError(f"sos must be (ns, 6), got {sos_np.shape}")
    kinds = []
    tables = []
    consts = []
    L = int(block_size)
    for row in sos_np:
        kind, prm = section_realization(row)
        kinds.append(kind)
        if kind == "coupled":
            alpha, beta, c1, c2, b0 = (float(v) for v in prm)
            tables.append(_coupled_tables(alpha, beta, L))
            consts.append((np.float32(c1), np.float32(c2), np.float32(b0)))
        else:
            b0, b1, b2, _, a1, a2 = (float(v) for v in row)
            tables.append(_companion_tables(a1, a2, b0, b1, b2, L))
            consts.append((np.float32(b0),))
    run = _run_cached(tuple(kinds), tuple(consts), L, bool(return_zf))
    nb = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    ns = sos_np.shape[0]
    if zi is None:
        zi_b = jnp.zeros((nb, ns, 2), dtype=jnp.float32)
    else:
        zi_b = jnp.asarray(zi).reshape(nb, ns, 2).astype(jnp.float32)
    return run(x, tuple(tables), zi_b)
