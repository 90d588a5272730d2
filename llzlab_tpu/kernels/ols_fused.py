"""Pallas TPU kernel: whole overlap-save FIR filter fused in VMEM.

Capability parity target: the reference's overlap-save fast-convolution
inner loop (``llz_fir.c``; mount empty — spec anchor BASELINE.json:5
"FIR convolution via overlap-save ... MXU-bound for block convolution").

The XLA engines (ops/fir.py "fft"/"fused") round-trip every intermediate
(packed spectra, twiddled stages, untangle products) through HBM — ~10
full passes over an 84 MB working set per step, which caps the chain at
~1.6 Gsamples/s on v5e.  This kernel keeps one frame's entire spectral
pipeline in VMEM:

  frame → four-step DFT → per-bin combine Z' = A·Z + B·conj(Z[σ]) →
  inverse four-step → valid samples out

with nfft = 32768 chosen so the packed half-size transform is exactly
16384 = 128·128: every stage is a native (128,128)@(128,128) MXU dot
per frame, the σ flip+roll is pure VPU lane/sublane moves, and the
wrap-around discard (hist = 1024 reals = 512 packed = 4 rows) is a
whole-row slice.  HBM traffic: one read of the framed signal, one write
of the valid samples — speed-of-light for this op.

Tables (DFT matrices, twiddles, A/B combine) are f64-derived on host by
``ols_matmul.ols_tables``-style probing; H is baked into A/B.
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
from llzlab_tpu.ops.transform import matmul_precision

__all__ = ["ols_pallas_tables", "ols_filter_pallas", "NFFT", "HALF", "N"]

NFFT = 32768
HALF = NFFT // 2
N = 128  # n1 = n2 = sqrt(HALF)


@functools.lru_cache(maxsize=8)
def _tables_cached(taps_bytes: bytes, nfft: int):
    assert nfft == NFFT
    taps = np.frombuffer(taps_bytes, np.float64)
    a = np.arange(N)
    F1 = np.exp(-2j * np.pi * np.outer(a, a) / N)     # F1[c, a] (= F2)
    Tw = np.exp(-2j * np.pi * np.outer(a, a) / HALF)  # Tw[c, b]
    A, B = _combine_coeffs(taps, nfft)
    k = N * a[None, :] + a[:, None]                   # (c, d) -> bin
    Acd = (A / HALF)[k]
    Bcd = (B / HALF)[k]

    def pack(m):
        return np.stack(
            [m.real.astype(np.float32), m.imag.astype(np.float32)], -1
        )

    with jax.ensure_compile_time_eval():
        return tuple(
            jnp.asarray(pack(m)) for m in (F1, Tw, Acd, Bcd)
        )


def ols_pallas_tables(taps) -> Tuple[jnp.ndarray, ...]:
    """(F1, Tw, A, B) device tables, each (128, 128, 2), for nfft=32768."""
    taps = np.asarray(jax.device_get(taps), np.float64)
    if len(taps) > HALF:
        raise ValueError("taps longer than nfft/2")
    return _tables_cached(taps.tobytes(), NFFT)


def _sigma(t):
    """t[(HALF − k) mod HALF] for k = N·d + c laid out as t[c, d]."""
    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    # H[c, d] = t[c, (N−d) mod N];  base rows c≥1: flip both axes, rolled.
    h = pltpu.roll(jnp.flip(t, 1), 1, axis=1)
    g = pltpu.roll(jnp.flip(jnp.flip(t, 0), 1), 1, axis=0)
    return jnp.where(row == 0, h, g)


def _kernel(hist2_rows, x_e_ref, x_o_ref, f1_ref, tw_ref, a_ref, b_ref,
            ye_ref, yo_ref):
    prec = matmul_precision()

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    f1r, f1i = f1_ref[:, :, 0], f1_ref[:, :, 1]
    twr, twi = tw_ref[:, :, 0], tw_ref[:, :, 1]
    ar, ai = a_ref[:, :, 0], a_ref[:, :, 1]
    br, bi = b_ref[:, :, 0], b_ref[:, :, 1]

    mr = x_e_ref[0]  # (128, 128): packed frame real part, m = 128·a + b
    mi = x_o_ref[0]

    # Forward stage 1: Y = F1 @ M    (contraction over a = rows of M)
    yr = dot(f1r, mr) - dot(f1i, mi)
    yi = dot(f1r, mi) + dot(f1i, mr)
    # Twiddle
    zr = yr * twr - yi * twi
    zi = yr * twi + yi * twr
    # Forward stage 2: X2 = Z @ F2   (F2 = F1; contraction over b = cols)
    x2r = dot(zr, f1r) - dot(zi, f1i)
    x2i = dot(zr, f1i) + dot(zi, f1r)

    # Per-bin combine with conj(Z[σ]): Z' = A·Z + B·conj(Zσ)
    sr = _sigma(x2r)
    si = _sigma(x2i)
    zpr = ar * x2r - ai * x2i + br * sr + bi * si
    zpi = ar * x2i + ai * x2r + bi * sr - br * si

    # Inverse stage 2: W = Z' @ conj(F2)
    wr = dot(zpr, f1r) + dot(zpi, f1i)
    wi = dot(zpi, f1r) - dot(zpr, f1i)
    # Inverse twiddle
    vr = wr * twr + wi * twi
    vi = wi * twr - wr * twi
    # Inverse stage 1: M' = conj(F1) @ V   (1/HALF already in A/B)
    or_ = dot(f1r, vr) + dot(f1i, vi)
    oi_ = dot(f1r, vi) - dot(f1i, vr)

    # Valid samples: drop the first hist/2 packed samples = whole rows.
    ye_ref[0] = or_[hist2_rows:, :]
    yo_ref[0] = oi_[hist2_rows:, :]


@functools.partial(jax.jit, static_argnames=("hist", "interpret"))
def _ols_pallas_jit(x, tables, hist: int, interpret: bool):
    f1, tw, acd, bcd = tables
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

    def frame(sig):  # (B, Th) -> (B·F, 128, 128)
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
        return fr.reshape(b * nframes, N, N)

    fe = frame(v[:, :, 0])
    fo = frame(v[:, :, 1])
    z = b * nframes

    tbl_spec = pl.BlockSpec(
        (N, N, 2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    ye, yo = pl.pallas_call(
        functools.partial(_kernel, hist2 // N),
        grid=(z,),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            tbl_spec, tbl_spec, tbl_spec, tbl_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, rows_out, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_out, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((z, rows_out, N), jnp.float32),
            jax.ShapeDtypeStruct((z, rows_out, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fe, fo, f1, tw, acd, bcd)

    ye = ye.reshape(b, nframes * hop2)
    yo = yo.reshape(b, nframes * hop2)
    y = jnp.stack([ye, yo], -1).reshape(b, nframes * hop)
    return y[:, :t]


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
