"""Pallas TPU kernel: whole overlap-save FIR filter fused in VMEM.

Capability parity target: the reference's overlap-save fast-convolution
inner loop (``llz_fir.c``; mount empty — spec anchor BASELINE.json:5
"FIR convolution via overlap-save ... MXU-bound for block convolution").

The XLA engines (ops/fir.py "fft"/"fused") round-trip every intermediate
(packed spectra, twiddled stages, untangle products) through HBM — ~10
full passes over an 84 MB working set per step.  This kernel keeps one
batch of frames' entire spectral pipeline in VMEM:

  frames → four-step DFT → per-bin combine Z' = A·Z + B·conj(Z[σ]) →
  inverse four-step → valid samples out

nfft = 32768 makes the packed half-size transform exactly 16384 =
128·128, so with ``zt`` frames per grid step every stage is one
(128,128) @ (128, zt·128) MXU matmul (or its tall (zt·128,128) @
(128,128) dual).  Mosaic-specific shape discipline, learned the hard
way (bench/tpu_pallas_ols_probe.py history):

  * per-frame 128³ dots starve the MXU (324 Msps) — batch frames into
    the non-contracted dim;
  * ``lax.rev`` has no Mosaic lowering and 3-D reshapes blow VMEM —
    the σ permutation is instead *folded into the tables*: a second
    stage-1/stage-2 branch with host-premultiplied (P_c·F1, P_c·Tw,
    F2·J) gives σ(X2) directly, up to one lane-roll on the c = 0 row;
  * everything in the kernel is strictly 2-D; the wide (c, f·b) ↔ tall
    (f·c, b) layout change between stages is zt slices + a concat.

Tables are f64-derived on host; H is baked into the A/B combine tables
(``ols_matmul._combine_coeffs`` probe).  HBM traffic: one read of the
framed signal, one write of the valid samples.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llzlab_tpu.ops.ols_matmul import _combine_coeffs

__all__ = ["ols_pallas_tables", "ols_filter_pallas", "NFFT", "HALF", "N"]

NFFT = 32768
HALF = NFFT // 2
N = 128  # n1 = n2 = sqrt(HALF)
ZT = 8   # frames per grid step


@functools.lru_cache(maxsize=8)
def _tables_cached(taps_bytes: bytes, nfft: int, zt: int):
    assert nfft == NFFT
    taps = np.frombuffer(taps_bytes, np.float64)
    a = np.arange(N)
    F1 = np.exp(-2j * np.pi * np.outer(a, a) / N)     # F1[c, a] (= F2)
    Tw = np.exp(-2j * np.pi * np.outer(a, a) / HALF)  # Tw[c, b]
    A, B = _combine_coeffs(taps, nfft)
    k = N * a[None, :] + a[:, None]                   # (c, d) -> bin
    Acd = (A / HALF)[k]
    Bcd = (B / HALF)[k]

    # σ support: P_c[c', c] = 1 iff c = (N−c') mod N;  J = anti-identity.
    Pc = np.zeros((N, N))
    Pc[a, (N - a) % N] = 1.0
    J = np.zeros((N, N))
    J[a, N - 1 - a] = 1.0
    F1p = Pc @ F1
    Twp = Pc @ Tw
    F2J = F1 @ J

    def pack(m):
        return np.stack(
            [m.real.astype(np.float32), m.imag.astype(np.float32)], -1
        )

    wideTw = np.tile(Tw, (1, zt))        # (N, zt·N): col f·N+b ↦ Tw[c,b]
    wideTwp = np.tile(Twp, (1, zt))
    tallA = np.tile(Acd, (zt, 1))        # (zt·N, N): row f·N+c ↦ A[c,d]
    tallB = np.tile(Bcd, (zt, 1))

    with jax.ensure_compile_time_eval():
        return tuple(
            jnp.asarray(pack(m))
            for m in (F1, F1p, F2J, wideTw, wideTwp, tallA, tallB)
        )


def ols_pallas_tables(taps, zt: int = ZT) -> Tuple[jnp.ndarray, ...]:
    """Device tables for :func:`ols_filter_pallas` (nfft = 32768)."""
    taps = np.asarray(jax.device_get(taps), np.float64)
    if len(taps) > HALF:
        raise ValueError("taps longer than nfft/2")
    return _tables_cached(taps.tobytes(), NFFT, zt)


def _kernel(hist2_rows, zt, xe_ref, xo_ref, f1_ref, f1p_ref, f2j_ref,
            tw_ref, twp_ref, a_ref, b_ref, ye_ref, yo_ref):
    prec = jax.lax.Precision.HIGHEST  # Mosaic supports DEFAULT|HIGHEST only

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def cdot_l(tr, ti, mr, mi):  # table @ M, complex
        return dot(tr, mr) - dot(ti, mi), dot(tr, mi) + dot(ti, mr)

    def cdot_r(mr, mi, tr, ti):  # M @ table, complex
        return dot(mr, tr) - dot(mi, ti), dot(mr, ti) + dot(mi, tr)

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    def wide_to_tall(w):  # (N, zt·N) cols (f,b) → (zt·N, N) rows (f,c)
        return jnp.concatenate(
            [w[:, f * N : (f + 1) * N] for f in range(zt)], axis=0
        )

    def tall_to_wide(t):
        return jnp.concatenate(
            [t[f * N : (f + 1) * N, :] for f in range(zt)], axis=1
        )

    f1r, f1i = f1_ref[:, :, 0], f1_ref[:, :, 1]
    f1pr, f1pi = f1p_ref[:, :, 0], f1p_ref[:, :, 1]
    f2jr, f2ji = f2j_ref[:, :, 0], f2j_ref[:, :, 1]
    twr, twi = tw_ref[:, :, 0], tw_ref[:, :, 1]
    twpr, twpi = twp_ref[:, :, 0], twp_ref[:, :, 1]
    ar_, ai_ = a_ref[:, :, 0], a_ref[:, :, 1]
    br_, bi_ = b_ref[:, :, 0], b_ref[:, :, 1]

    # Input frames (zt, N, N) → wide (N, zt·N): M[a, f·N + b].
    mr = jnp.concatenate([xe_ref[f] for f in range(zt)], axis=1)
    mi = jnp.concatenate([xo_ref[f] for f in range(zt)], axis=1)

    # Forward stage 1 (wide, c-side): Y = F1 @ M; σ branch Yp = (P_c F1) @ M
    yr, yi = cdot_l(f1r, f1i, mr, mi)
    ypr, ypi = cdot_l(f1pr, f1pi, mr, mi)
    # Twiddle (wide)
    zr, zi = cmul(yr, yi, twr, twi)
    zpr, zpi = cmul(ypr, ypi, twpr, twpi)
    # Stage 2 (tall, d-side): X2 = Z @ F2;  X2p = Zp @ (F2 J)
    tzr, tzi = wide_to_tall(zr), wide_to_tall(zi)
    tzpr, tzpi = wide_to_tall(zpr), wide_to_tall(zpi)
    x2r, x2i = cdot_r(tzr, tzi, f1r, f1i)
    x2pr, x2pi = cdot_r(tzpr, tzpi, f2jr, f2ji)

    # σ(X2) = X2p, except the c = 0 row of every frame needs a d-roll by 1.
    row = jax.lax.broadcasted_iota(jnp.int32, (zt * N, N), 0)
    first = (row % N) == 0
    sr = jnp.where(first, pltpu.roll(x2pr, 1, axis=1), x2pr)
    si = jnp.where(first, pltpu.roll(x2pi, 1, axis=1), x2pi)

    # Per-bin combine: Z' = A·X2 + B·conj(σ(X2))   (H baked into A/B)
    zr2 = ar_ * x2r - ai_ * x2i + br_ * sr + bi_ * si
    zi2 = ar_ * x2i + ai_ * x2r + bi_ * sr - br_ * si

    # Inverse stage 2 (tall): W = Z' @ conj(F2)
    wr, wi = cdot_r(zr2, zi2, f1r, -f1i)
    # Inverse twiddle (wide) + inverse stage 1: M' = conj(F1) @ V
    wwr, wwi = tall_to_wide(wr), tall_to_wide(wi)
    vr, vi = cmul(wwr, wwi, twr, -twi)
    or_, oi_ = cdot_l(f1r, -f1i, vr, vi)

    # Valid samples: drop hist/2 packed = first hist2_rows a-rows; emit
    # per-frame (rows_out, N) even/odd blocks (interleave happens in XLA —
    # a trailing (…, 2) block here would tile with lane dim 2 and waste
    # 64× VMEM).
    for f in range(zt):
        ye_ref[f] = or_[hist2_rows:, f * N : (f + 1) * N]
        yo_ref[f] = oi_[hist2_rows:, f * N : (f + 1) * N]


@functools.partial(jax.jit, static_argnames=("hist", "interpret", "zt"))
def _ols_pallas_jit(x, tables, hist: int, interpret: bool, zt: int = ZT):
    f1, f1p, f2j, tw, twp, acd, bcd = tables
    hop = NFFT - hist
    hop2 = hop // 2
    hist2 = hist // 2
    assert hist2 % N == 0, "hist/2 must be a multiple of 128"
    rows_out = N - hist2 // N
    b, tp = x.shape
    t = tp - hist
    nframes = -(-t // hop)
    pad_tail = hist + nframes * hop - tp
    xp = jnp.pad(x, ((0, 0), (0, pad_tail))).astype(jnp.float32)
    v = xp.reshape(b, (tp + pad_tail) // 2, 2)
    z = b * nframes
    zt = min(zt, z)
    zpad = (-z) % zt
    zp = z + zpad

    def frame(sig):  # (B, Th) -> (B·F(+pad), N, N) packed frames
        nblk = -(-HALF // hop2)
        need = (nframes - 1 + nblk) * hop2
        if sig.shape[1] < need:
            sig = jnp.pad(sig, ((0, 0), (0, need - sig.shape[1])))
        parts = [
            sig[:, e * hop2 : (e + nframes) * hop2].reshape(
                b, nframes, hop2
            )
            for e in range(nblk)
        ]
        fr = jnp.concatenate(parts, axis=-1)[:, :, :HALF]
        fr = fr.reshape(z, N, N)
        if zpad:
            fr = jnp.pad(fr, ((0, zpad), (0, 0), (0, 0)))
        return fr

    fe = frame(v[:, :, 0])
    fo = frame(v[:, :, 1])

    def tbl(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    y = pl.pallas_call(
        functools.partial(_kernel, hist2 // N, zt),
        grid=(zp // zt,),
        in_specs=[
            pl.BlockSpec((zt, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((zt, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            tbl((N, N, 2)), tbl((N, N, 2)), tbl((N, N, 2)),
            tbl((N, zt * N, 2)), tbl((N, zt * N, 2)),
            tbl((zt * N, N, 2)), tbl((zt * N, N, 2)),
        ],
        out_specs=[
            pl.BlockSpec((zt, rows_out, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((zt, rows_out, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((zp, rows_out, N), jnp.float32),
            jax.ShapeDtypeStruct((zp, rows_out, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fe, fo, f1, f1p, f2j, tw, twp, acd, bcd)

    ye, yo = y
    ye = ye[:z].reshape(b, nframes * hop2)
    yo = yo[:z].reshape(b, nframes * hop2)
    out = jnp.stack([ye, yo], -1).reshape(b, nframes * hop)
    return out[:, :t]


def ols_filter_pallas(x: jnp.ndarray, taps, hist: int, *,
                      interpret: bool = False) -> jnp.ndarray:
    """Overlap-save on (B, hist+T) pre-padded input → (B, T) output.

    Same contract as ``ols_matmul.ols_filter_matmul`` but nfft is fixed
    at 32768 (``hist`` must satisfy hist = 32768 − hop with hop even and
    hist/2 a multiple of 128 — the default ``ols_hop`` grid gives
    hist = 1024 for ≤1025 taps).
    """
    tables = ols_pallas_tables(taps)
    return _ols_pallas_jit(x, tables, hist, interpret)
