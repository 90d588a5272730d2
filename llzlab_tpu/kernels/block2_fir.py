"""Pallas TPU kernel: fused two-matmul Toeplitz ("block2") FIR filter.

Capability parity target: the reference's direct FIR inner loop
(``llz_fir.c``; mount empty — spec anchor BASELINE.json:5 "FIR
convolution via overlap-save ... MXU-bound for block convolution").

The XLA block2 engine (ops/fir.py `_block2_filter`) is the measured
winner at 1024 taps, but it materialises both shifted operand copies and
two matmul intermediates in HBM and relies on `Precision.HIGH` — in
total ~6 extra passes over the 63 MB working set per step, landing at
~29 % of the 3-pass MXU peak.  This kernel keeps the whole thing in
VMEM:

    y_j = [x_{j-1} | x_j] @ W,   W = [[B], [A]],
    A[m, i] = h[i − m],  B[m, i] = h[block + i − m]

with the 3-pass bf16 ("HIGH") decomposition done *explicitly*: the
operand slab is split into bf16 hi/lo parts on the VPU and the product
is  S_hi@W_hi + S_lo@W_hi + S_hi@W_lo  — three single-pass bf16 MXU
matmuls (the discarded lo·lo term is ~2⁻³² relative, far below the
bf16x3 error floor).  W_hi/W_lo live in VMEM across the whole grid
(constant index map), so HBM traffic is one read of the padded signal
and one write of the output — the speed-of-light for this op.

`mode="highest"` instead runs full-f32 dots (Mosaic supports
DEFAULT|HIGHEST only) for ~139 dB chains at half the rate.

Grid: programs stride `jt` output blocks; rows per matmul = C·jt
(channels × blocks pair up in the M dimension, so even few-channel
inputs fill the 128-row MXU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["block2_fir_pallas", "block2_pallas_tables", "supports"]


def supports(channels: int, ntaps: int, block: int) -> bool:
    """Shape envelope this kernel handles (caller falls back otherwise)."""
    return (
        channels >= 8
        and channels % 8 == 0
        and block % 128 == 0
        and ntaps - 1 <= block
        and block <= 2048
    )


def _w_matrix(taps: np.ndarray, block: int) -> np.ndarray:
    """(2·block, block) f64 combined Toeplitz halves W = [[B], [A]]."""
    ntaps = len(taps)
    w = np.zeros((2 * block, block), np.float64)
    i = np.arange(block)
    for m in range(block):
        k = i - m  # current block taps (A, bottom half)
        sel = (k >= 0) & (k < ntaps)
        w[block + m, i[sel]] = taps[k[sel]]
        k2 = block + i - m  # previous block taps (B, top half)
        sel2 = (k2 >= 0) & (k2 < ntaps)
        w[m, i[sel2]] = taps[k2[sel2]]
    return w


@functools.lru_cache(maxsize=16)
def _tables_cached(taps_bytes: bytes, block: int, mode: str):
    taps = np.frombuffer(taps_bytes, np.float64)
    w = _w_matrix(taps, block)
    with jax.ensure_compile_time_eval():
        if mode == "highest":
            return (jnp.asarray(w.astype(np.float32)),)
        hi = w.astype(np.float32).astype(jnp.bfloat16)
        lo = (w - np.asarray(hi, np.float64)).astype(np.float32)
        return jnp.asarray(hi), jnp.asarray(lo).astype(jnp.bfloat16)


def block2_pallas_tables(taps, block: int, mode: str = "high"):
    """Host-built W tables: (W_hi, W_lo) bf16 for mode="high", (W,) f32
    for mode="highest"."""
    taps = np.asarray(jax.device_get(taps), np.float64)
    return _tables_cached(taps.tobytes(), block, mode)


def _slab(jt, block, x_ref, xn_ref):
    """(C·jt, 2·block) operand: row-block j = [x_{p+j} | x_{p+j+1}]."""
    c = x_ref.shape[0]
    rows = []
    for j in range(jt):
        left = x_ref[:, j * block : (j + 1) * block]
        right = (
            xn_ref[:, :]
            if j == jt - 1
            else x_ref[:, (j + 1) * block : (j + 2) * block]
        )
        rows.append(jnp.concatenate([left, right], axis=1))
    s = jnp.concatenate(rows, axis=0)
    return c, s


def _kernel_high(jt, block, x_ref, xn_ref, whi_ref, wlo_ref, o_ref):
    c, s = _slab(jt, block, x_ref, xn_ref)  # (C·jt, 2·block) f32
    s_hi = s.astype(jnp.bfloat16)
    s_lo = (s - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    y = dot(s_hi, whi_ref[:]) + dot(s_lo, whi_ref[:]) + dot(s_hi, wlo_ref[:])
    for j in range(jt):
        o_ref[:, j * block : (j + 1) * block] = y[j * c : (j + 1) * c, :]


def _kernel_highest(jt, block, x_ref, xn_ref, w_ref, o_ref):
    c, s = _slab(jt, block, x_ref, xn_ref)
    y = jax.lax.dot_general(
        s, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    for j in range(jt):
        o_ref[:, j * block : (j + 1) * block] = y[j * c : (j + 1) * c, :]


@functools.partial(
    jax.jit, static_argnames=("block", "mode", "interpret", "jt")
)
def _block2_pallas_jit(xpad, tables, *, block: int, mode: str,
                       interpret: bool, jt: int = 0):
    b, tp = xpad.shape
    t = tp - block
    nblk = -(-t // block)
    if jt <= 0:
        jt = max(2, 128 // max(b, 1))
    jt = min(jt, max(nblk, 1))
    nprog = -(-nblk // jt)
    need = (nprog * jt + 1) * block
    xp = jnp.pad(xpad, ((0, 0), (0, need - tp))) if need > tp else xpad

    kern = _kernel_high if mode == "high" else _kernel_highest
    wspecs = [
        pl.BlockSpec(w.shape, (lambda i: (0,) * w.ndim),
                     memory_space=pltpu.VMEM)
        for w in tables
    ]
    y = pl.pallas_call(
        functools.partial(kern, jt, block),
        grid=(nprog,),
        in_specs=[
            # program i sees input blocks [i·jt, i·jt + jt) …
            pl.BlockSpec((b, jt * block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            # … plus the one look-ahead block i·jt + jt (x3 passed twice;
            # index is in units of the (b, block) block shape).
            pl.BlockSpec((b, block), lambda i, _jt=jt: (0, i * _jt + _jt),
                         memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=pl.BlockSpec((b, jt * block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nprog * jt * block), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, xp, *tables)
    return y[:, :t]


def block2_fir_pallas(xpad: jnp.ndarray, taps, block: int, *,
                      mode: str = "high",
                      interpret: bool = False) -> jnp.ndarray:
    """Fused block2 FIR on (B, block+T) pre-padded input → (B, T).

    Same contract as ``ops.fir._block2_filter``: one full block of
    history is prepended by the caller; ``block ≥ ntaps − 1``.
    ``mode``: "high" = explicit bf16x3 (≈ Precision.HIGH, ~100 dB),
    "highest" = full-f32 dots (~139 dB, ~2× slower).
    """
    tables = block2_pallas_tables(taps, block, mode)
    return _block2_pallas_jit(
        xpad, tables, block=block, mode=mode, interpret=interpret
    )
