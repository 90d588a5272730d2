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


def band_k(ntaps: int, block: int) -> int:
    """Contraction-band width per 128-column output tile.

    Output column i of W = [[B],[A]] is W[m, i] = h[block + i − m],
    nonzero only for m ∈ [block+i−ntaps+1, block+i] — an ntaps-row band.
    A 128-column tile therefore touches ntaps+127 rows; aligned to the
    128-lane grid that is ``block + 128 − 128·⌊(block−ntaps+1)/128⌋``
    (= 1152 for the headline 1024-tap/1024-block case → 1.78× fewer
    MACs than the dense 2·block contraction).
    """
    return block + 128 - 128 * ((block - ntaps + 1) // 128)


@functools.lru_cache(maxsize=16)
def _tables_cached(taps_bytes: bytes, block: int, mode: str):
    taps = np.frombuffer(taps_bytes, np.float64)
    w = _w_matrix(taps, block)
    kb = band_k(len(taps), block)
    nt = block // 128
    wt = np.zeros((nt, kb, 128), np.float64)
    for g in range(nt):
        ms = g * 128 + block + 128 - kb
        wt[g] = w[ms : ms + kb, g * 128 : (g + 1) * 128]
    with jax.ensure_compile_time_eval():
        if mode == "highest":
            return (jnp.asarray(wt.astype(np.float32)),)
        hi = wt.astype(np.float32).astype(jnp.bfloat16)
        lo_f = wt - np.asarray(hi, np.float64)
        lo = lo_f.astype(np.float32).astype(jnp.bfloat16)
        if mode == "highcat":
            cat = np.concatenate(
                [np.asarray(hi, np.float32),
                 np.asarray(hi, np.float32),
                 np.asarray(lo, np.float32)],
                axis=1,
            )
            return (jnp.asarray(cat).astype(jnp.bfloat16),)
        return jnp.asarray(hi), jnp.asarray(lo)


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


def _kernel_high(jt, block, kb, x_ref, xn_ref, whi_ref, wlo_ref, o_ref):
    c, s = _slab(jt, block, x_ref, xn_ref)  # (C·jt, 2·block) f32
    s_hi = s.astype(jnp.bfloat16)
    s_lo = (s - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    nt = block // 128
    for g in range(nt):
        ms = g * 128 + block + 128 - kb
        sh = s_hi[:, ms : ms + kb]
        sl = s_lo[:, ms : ms + kb]
        y = dot(sh, whi_ref[g]) + dot(sl, whi_ref[g]) + dot(sh, wlo_ref[g])
        for j in range(jt):
            o_ref[:, j * block + g * 128 : j * block + (g + 1) * 128] = (
                y[j * c : (j + 1) * c, :]
            )


def _kernel_highcat(jt, block, kb, x_ref, xn_ref, wcat_ref, o_ref):
    """bf16x3 as ONE dot per column tile: the three passes are stacked
    along K — [s_hi | s_lo | s_hi] @ [[W_hi]; [W_hi]; [W_lo]] — so the
    MXU sees a single (C·jt, 3·kb)·(3·kb, 128) matmul instead of three
    pipeline-draining small ones."""
    c, s = _slab(jt, block, x_ref, xn_ref)
    s_hi = s.astype(jnp.bfloat16)
    s_lo = (s - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    nt = block // 128
    for g in range(nt):
        ms = g * 128 + block + 128 - kb
        sh = s_hi[:, ms : ms + kb]
        sl = s_lo[:, ms : ms + kb]
        scat = jnp.concatenate([sh, sl, sh], axis=1)
        y = jax.lax.dot_general(
            scat, wcat_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for j in range(jt):
            o_ref[:, j * block + g * 128 : j * block + (g + 1) * 128] = (
                y[j * c : (j + 1) * c, :]
            )


def _kernel_highest(jt, block, kb, x_ref, xn_ref, w_ref, o_ref):
    c, s = _slab(jt, block, x_ref, xn_ref)
    nt = block // 128
    for g in range(nt):
        ms = g * 128 + block + 128 - kb
        y = jax.lax.dot_general(
            s[:, ms : ms + kb], w_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        for j in range(jt):
            o_ref[:, j * block + g * 128 : j * block + (g + 1) * 128] = (
                y[j * c : (j + 1) * c, :]
            )


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

    kern = {"high": _kernel_high, "highcat": _kernel_highcat,
            "highest": _kernel_highest}[mode]
    kb = tables[0].shape[1]
    if mode == "highcat":
        kb //= 3
    wspecs = [
        pl.BlockSpec(w.shape, (lambda i: (0,) * w.ndim),
                     memory_space=pltpu.VMEM)
        for w in tables
    ]
    y = pl.pallas_call(
        functools.partial(kern, jt, block, kb),
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
