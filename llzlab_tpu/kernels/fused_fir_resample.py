"""Pallas TPU kernel: fused block2-FIR + polyphase-resample chain step.

Capability parity target: the reference's ``llz_fir.c`` + ``llz_resample.c``
streaming loops composed per frame (mount empty — spec anchors
BASELINE.json:2 "1024-tap FIR+resample chain" and BASELINE.json:5
"speed-of-light ... MXU-bound for block convolution").

The unfused chain runs the block2 FIR (two banded Toeplitz matmuls) and
the polyphase slab matmul as separate XLA/Pallas calls, bouncing the
full-rate intermediate ``y`` through HBM and paying XLA relayouts between
them.  This kernel keeps the whole step VMEM-resident:

  per grid program (P = G·down input samples, G·up output samples):
    1. block2 FIR into a VMEM scratch ``y_ext`` — ``P/block + 1`` output
       blocks, the extra left block recomputing the resampler's
       ``K−1``-sample lookback halo from input history (cheap: one
       duplicated block per program, and bitwise identical to the
       neighbouring program's copy since the operands and tile order
       match exactly);
    2. the dense polyphase group matmul straight out of ``y_ext``:
       ``slab (B·G, down+K−1) @ Wᵀ (down+K−1, up)``.

``G`` is chosen so ``G·up ≡ 0 (mod 128)`` — output writes stay
lane-aligned (147/160 → G = 128, P = 20480, 18816 outputs/program).

Precision modes (matching kernels/block2_fir.py):
  * ``"high"``  — explicit bf16x3: operands split into bf16 hi/lo on the
    VPU, products ``S_hi·W_hi + S_lo·W_hi + S_hi·W_lo`` (three single-pass
    MXU matmuls; the dropped lo·lo term is ~2⁻³² relative).
  * ``"highest"`` — full-f32 dots (Mosaic supports DEFAULT|HIGHEST), ~2×
    slower, ~139 dB.

Streaming state is the last ``2·block`` *input* samples — the FIR history
(1 block) plus enough extra reach to recompute the resampler's y-history
(``(K−1) + (ntaps−1) ≤ 2·block`` by construction), so the op carries ONE
tensor where the unfused chain carries two.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llzlab_tpu.kernels.block2_fir import (band_k, block2_pallas_tables,
                                           _w_matrix)
from llzlab_tpu.ops.fir import block2_block
from llzlab_tpu.ops.resample import polyphase_weights, resample_output_len


@functools.lru_cache(maxsize=16)
def _wide_band_tables_cached(taps_bytes: bytes, block: int, nw: int,
                             mode: str):
    """Banded-wide FIR tiles: ``nw`` adjacent 128-column output tiles per
    dot.  The contraction window widens to kb + (nw−1)·128 rows (the
    union of the nw shifted bands — +128/kb MACs per extra tile, ~11%
    at nw=2 for the 1024-tap case) in exchange for half the dot
    launches, 256-wide MXU N, and 256-column y stores."""
    taps = np.frombuffer(taps_bytes, np.float64)
    w = _w_matrix(taps, block)
    kb = band_k(len(taps), block)
    ms0 = block + 128 - kb
    nt = block // 128
    assert nt % nw == 0
    ng = nt // nw
    kbw = kb + (nw - 1) * 128
    wt = np.zeros((ng, kbw, nw * 128), np.float64)
    for g in range(ng):
        rs = g * nw * 128 + ms0
        re = min(rs + kbw, 2 * block)
        wt[g, : re - rs] = w[rs:re, g * nw * 128 : (g + 1) * nw * 128]
    with jax.ensure_compile_time_eval():
        if mode == "highest":
            return (jnp.asarray(wt.astype(np.float32)),)
        hi = wt.astype(np.float32).astype(jnp.bfloat16)
        lo = (wt - np.asarray(hi, np.float64)).astype(np.float32).astype(
            jnp.bfloat16
        )
        return jnp.asarray(hi), jnp.asarray(lo)


__all__ = [
    "fused_fir_resample_pallas",
    "fused_supports",
    "fused_static_ok",
    "fused_program_in",
    "fused_state_len",
    "fused_tables",
]


def fused_program_in(ntaps: int, up: int, down: int) -> int:
    """Input samples per grid program: the smallest P with
    ``P % (2·block) == 0``, ``P % down == 0`` and ``(P/down)·up % 128 == 0``.
    """
    block = block2_block(ntaps)
    g0 = 128 // math.gcd(up, 128)
    return (g0 * down * 2 * block) // math.gcd(g0 * down, 2 * block)


def fused_state_len(ntaps: int) -> int:
    """Streaming history length (input samples): ``2·block``."""
    return 2 * block2_block(ntaps)


def fused_static_ok(ntaps: int, up: int, down: int, k: int) -> bool:
    """Channel/length-independent part of the shape envelope (usable at
    chain-construction time before the batch is known)."""
    block = block2_block(ntaps)
    if not (ntaps - 1 <= block <= 2048):
        return False
    if k - 1 > block or k - 1 > down + block:  # halo must fit one y-block
        return False
    p = fused_program_in(ntaps, up, down)
    return p <= 65536  # VMEM envelope (~P·B·4·2 bytes input double-buffer)


def fused_supports(channels: int, ntaps: int, up: int, down: int,
                   k: int, t: int) -> bool:
    """Shape envelope this kernel handles (caller falls back otherwise)."""
    if not (channels >= 8 and channels % 8 == 0):
        return False
    if not fused_static_ok(ntaps, up, down, k):
        return False
    p = fused_program_in(ntaps, up, down)
    return t % p == 0 and t > 0


@functools.lru_cache(maxsize=16)
def _rs_tables_cached(r_bytes: bytes, up: int, down: int, mode: str):
    rtaps = np.frombuffer(r_bytes, np.float64)
    w = polyphase_weights(rtaps, up, down).T  # (down+K−1, up) float64
    # Pad the contraction dim to a lane multiple: the kernel slices fixed
    # 128-multiple windows out of the y scratch and the zero rows absorb
    # the over-read (scratch tail is explicitly zeroed).
    k2p = -(-w.shape[0] // 128) * 128
    w = np.pad(w, ((0, k2p - w.shape[0]), (0, 0)))
    with jax.ensure_compile_time_eval():
        if mode == "highest":
            return (jnp.asarray(w.astype(np.float32)),)
        hi = w.astype(np.float32).astype(jnp.bfloat16)
        lo = (w - np.asarray(hi, np.float64)).astype(np.float32).astype(
            jnp.bfloat16
        )
        return jnp.asarray(hi), jnp.asarray(lo)


@functools.lru_cache(maxsize=16)
def _wide_tables_cached(taps_bytes: bytes, block: int, mode: str):
    """Dense (2·block, block) block2 weight (zero-padded band): one
    K=2·block, N=block dot per y-block instead of nt banded
    K=band, N=128 dots — 1.78× the MACs at the headline shape but a
    full-width MXU N dimension."""
    taps = np.frombuffer(taps_bytes, np.float64)
    w = _w_matrix(taps, block)
    with jax.ensure_compile_time_eval():
        if mode == "highest":
            return (jnp.asarray(w.astype(np.float32)),)
        hi = w.astype(np.float32).astype(jnp.bfloat16)
        lo = (w - np.asarray(hi, np.float64)).astype(np.float32).astype(
            jnp.bfloat16
        )
        return jnp.asarray(hi), jnp.asarray(lo)


def fused_tables(fir_taps, rtaps, up: int, down: int, mode: str = "high",
                 wide: bool = False, nw: int = 1):
    """Host-built weight tables: FIR banded tiles (or the dense wide
    matrix, or nw-wide banded tiles) + resample bank."""
    fir_np = np.asarray(jax.device_get(fir_taps), np.float64)
    block = block2_block(len(fir_np))
    if wide:
        wt = _wide_tables_cached(fir_np.tobytes(), block, mode)
    elif nw > 1:
        wt = _wide_band_tables_cached(fir_np.tobytes(), block, nw, mode)
    else:
        wt = block2_pallas_tables(fir_taps, block, mode)
    rt = _rs_tables_cached(
        np.asarray(rtaps, np.float64).tobytes(), up, down, mode
    )
    return wt + rt


def _dot(a, b, highest=False):
    kw = dict(preferred_element_type=jnp.float32)
    if highest:
        kw["precision"] = jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), **kw)


def _bf16_split(s):
    hi = s.astype(jnp.bfloat16)
    lo = (s - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel(block, kb, nt, nyb, up, down, k2, G, off, mode, gb, rs_batch,
            wide, tdim, xp_ref, xm_ref, xh_ref, *refs):
    # Inputs (r3 layout — history is a SEPARATE input, so the caller
    # never materialises concat(hist, x) in HBM):
    #   xp_ref: the 2·block of signal preceding this program's window
    #           (clamped to x[0:2b) at program 0, unused there)
    #   xm_ref: this program's P_in window of x
    #   xh_ref: the carried 2·block stream history (selected over xp at
    #           program 0 — the only program whose left context is not
    #           in x)
    if mode == "high":
        whi_ref, wlo_ref, rhi_ref, rlo_ref, o_ref, y_ref = refs[:6]
    else:
        w_ref, r_ref, o_ref, y_ref = refs[:4]
    sl_ref = refs[-1] if rs_batch > 1 else None
    b = xm_ref.shape[0]
    i_t = pl.program_id(tdim)

    def piece(j):
        if j < 2:
            sl = slice(j * block, (j + 1) * block)
            return jnp.where(i_t == 0, xh_ref[:, sl], xp_ref[:, sl])
        return xm_ref[:, (j - 2) * block : (j - 1) * block]

    # ---- stage 1: block2 FIR into VMEM scratch -------------------------
    # Local y block m covers global FIR outputs [i·P − block + m·block, …);
    # its operand pair is local window blocks (m, m+1).
    for g0 in range(0, nyb, gb):
        gs = min(gb, nyb - g0)
        rows = [
            jnp.concatenate([piece(g0 + j), piece(g0 + j + 1)], axis=1)
            for j in range(gs)
        ]
        s = jnp.concatenate(rows, axis=0) if gs > 1 else rows[0]
        if mode == "high":
            s_hi, s_lo = _bf16_split(s)
        if wide:
            # one dense K=2·block, N=block dot per y-block batch
            if mode == "high":
                y = (_dot(s_hi, whi_ref[:, :]) + _dot(s_lo, whi_ref[:, :])
                     + _dot(s_hi, wlo_ref[:, :]))
            else:
                y = _dot(s, w_ref[:, :], highest=True)
            for j in range(gs):
                col = (g0 + j) * block
                y_ref[:, col : col + block] = y[j * b : (j + 1) * b, :]
            continue
        for t in range(nt):
            ms = t * 128 + block + 128 - kb
            if mode == "high":
                sh = s_hi[:, ms : ms + kb]
                sl = s_lo[:, ms : ms + kb]
                y = (_dot(sh, whi_ref[t]) + _dot(sl, whi_ref[t])
                     + _dot(sh, wlo_ref[t]))
            else:
                y = _dot(s[:, ms : ms + kb], w_ref[t], highest=True)
            for j in range(gs):
                col = (g0 + j) * block + t * 128
                y_ref[:, col : col + 128] = y[j * b : (j + 1) * b, :]

    # ---- stage 2: polyphase group matmul straight out of VMEM ----------
    # Group s consumes y_ext[off + s·down : … + k2); windows are sliced
    # per group (Mosaic handles the unaligned lane offsets with rolls —
    # a (…, G, down) reshape with down ∤ 128 is not expressible) and the
    # contraction is padded to k2p lanes with zero weight rows.
    k2p = (rhi_ref if mode == "high" else r_ref).shape[0]
    nyb_cols = nyb * block
    if off + (G - 1) * down + k2p > nyb_cols:
        # zero the scratch tail the padded windows over-read
        y_ref[:, nyb_cols:] = jnp.zeros(
            (b, y_ref.shape[1] - nyb_cols), jnp.float32
        )
    def rs_dot(sl):
        if mode == "high":
            sh, slo = _bf16_split(sl)
            return (_dot(sh, rhi_ref[:, :]) + _dot(slo, rhi_ref[:, :])
                    + _dot(sh, rlo_ref[:, :]))
        return _dot(sl, r_ref[:, :], highest=True)

    if rs_batch <= 1:
        # One dot triple per group, straight from the unaligned window
        # (Mosaic relayouts the operand; no cross-offset concat needed).
        for s in range(G):
            a0 = off + s * down
            z = rs_dot(y_ref[:, a0 : a0 + k2p])
            o_ref[:, s * up : (s + 1) * up] = z[:, :up]
    else:
        # Batch rs_batch groups into the M dimension by staging the
        # windows through a VMEM scratch — the stores normalise the
        # per-group lane-offset layouts that a direct sublane concat
        # of the slices cannot mix.
        for t in range(0, G, rs_batch):
            gs = min(rs_batch, G - t)
            for j in range(gs):
                a0 = off + (t + j) * down
                sl_ref[j * b : (j + 1) * b, :] = y_ref[:, a0 : a0 + k2p]
            z = rs_dot(sl_ref[: gs * b, :])
            for j in range(gs):
                o_ref[:, (t + j) * up : (t + j + 1) * up] = (
                    z[j * b : (j + 1) * b, :up]
                )


def _kernel_v4(block, kb, nt, nyb, up, down, k2, G, off, mode, rs_batch,
               nw, tdim, xp_ref, xm_ref, xh_ref, *refs):
    """Split-once dataflow (r4, VERDICT r3 next-round #1).

    v3 built a (b, 2·block) operand per y-block by CONCATENATING two
    x pieces and re-splitting the concatenation to bf16 hi/lo — ~4 VPU
    passes + 2 copy passes per input lane, the measured 55% "VMEM/VPU
    choreography" (docs/ROOFLINE.md).  But consecutive y-blocks read
    CONTIGUOUS x: the concat only existed to stitch the left-context
    boundary.  v4 materialises one contiguous [left-context | xm]
    scratch, bf16-splits it ONCE per program (2 VPU passes total), and
    every FIR dot reads an aligned static slice of the split scratch.
    ``nw`` batches adjacent output tiles into one dot (N = nw·128) via
    the banded-wide tables.
    """
    if mode == "high":
        whi_ref, wlo_ref, rhi_ref, rlo_ref, o_ref = refs[:5]
        y_ref, xs_hi, xs_lo = refs[5:8]
        sl_ref = refs[8] if rs_batch > 1 else None
    else:
        w_ref, r_ref, o_ref = refs[:3]
        y_ref, xs = refs[3:5]
        sl_ref = refs[5] if rs_batch > 1 else None
    b = xm_ref.shape[0]
    i_t = pl.program_id(tdim)
    ext = 2 * block
    ms0 = block + 128 - kb
    kbw = kb + (nw - 1) * 128

    # ---- stage 0: one split pass over [left | xm] ----------------------
    # Chunked at 2·block lanes so Mosaic schedules bounded vector values
    # (a single (cb, P) split is a ~16 MB value at p_mult=3).
    left = jnp.where(i_t == 0, xh_ref[:, :], xp_ref[:, :])
    p_lanes = xm_ref.shape[1]
    if mode == "high":
        lh, ll = _bf16_split(left)
        xs_hi[:, :ext] = lh
        xs_lo[:, :ext] = ll
        for j0 in range(0, p_lanes, ext):
            seg = xm_ref[:, j0 : j0 + ext]
            mh, ml = _bf16_split(seg)
            xs_hi[:, ext + j0 : 2 * ext + j0] = mh
            xs_lo[:, ext + j0 : 2 * ext + j0] = ml
    else:
        xs[:, :ext] = left
        for j0 in range(0, p_lanes, ext):
            xs[:, ext + j0 : 2 * ext + j0] = xm_ref[:, j0 : j0 + ext]

    # ---- stage 1: banded FIR dots from aligned slices ------------------
    for m in range(nyb):
        for g in range(nt // nw):
            a0 = m * block + g * nw * 128 + ms0
            if mode == "high":
                sh = xs_hi[:, a0 : a0 + kbw]
                sl = xs_lo[:, a0 : a0 + kbw]
                y = (_dot(sh, whi_ref[g]) + _dot(sl, whi_ref[g])
                     + _dot(sh, wlo_ref[g]))
            else:
                y = _dot(xs[:, a0 : a0 + kbw], w_ref[g], highest=True)
            col = m * block + g * nw * 128
            y_ref[:, col : col + nw * 128] = y

    # ---- stage 2: polyphase group matmul (same as v3) ------------------
    k2p = (rhi_ref if mode == "high" else r_ref).shape[0]
    nyb_cols = nyb * block
    if off + (G - 1) * down + k2p > nyb_cols:
        y_ref[:, nyb_cols:] = jnp.zeros(
            (b, y_ref.shape[1] - nyb_cols), jnp.float32
        )

    def rs_dot(sl):
        if mode == "high":
            sh, slo = _bf16_split(sl)
            return (_dot(sh, rhi_ref[:, :]) + _dot(slo, rhi_ref[:, :])
                    + _dot(sh, rlo_ref[:, :]))
        return _dot(sl, r_ref[:, :], highest=True)

    if rs_batch <= 1:
        for s in range(G):
            a0 = off + s * down
            z = rs_dot(y_ref[:, a0 : a0 + k2p])
            o_ref[:, s * up : (s + 1) * up] = z[:, :up]
    else:
        for t in range(0, G, rs_batch):
            gs = min(rs_batch, G - t)
            for j in range(gs):
                a0 = off + (t + j) * down
                sl_ref[j * b : (j + 1) * b, :] = y_ref[:, a0 : a0 + k2p]
            z = rs_dot(sl_ref[: gs * b, :])
            for j in range(gs):
                o_ref[:, (t + j) * up : (t + j + 1) * up] = (
                    z[j * b : (j + 1) * b, :up]
                )


def _channel_tile(b: int, cap: int = 128) -> int:
    """Largest divisor of ``b`` that is ≤ cap and a multiple of 8 —
    the per-program channel tile (``b % 8 == 0`` by ``fused_supports``)."""
    if b <= cap:
        return b
    best = 8
    d = 1
    while d * d <= b:
        if b % d == 0:
            for q in (d, b // d):
                if q <= cap and q % 8 == 0:
                    best = max(best, q)
        d += 1
    return best


@functools.partial(
    jax.jit,
    static_argnames=("ntaps", "up", "down", "k", "mode", "interpret", "gb",
                     "rs_batch", "wide", "p_mult", "impl", "nw", "cb"),
)
def _fused_pallas_jit(x, hist, tables, *, ntaps: int, up: int, down: int,
                      k: int, mode: str, interpret: bool, gb: int = 0,
                      rs_batch: int = 8, wide: bool = False,
                      p_mult: int = 1, impl: str = "v3", nw: int = 1,
                      cb: int = 0):
    block = block2_block(ntaps)
    b, t = x.shape
    p_in = fused_program_in(ntaps, up, down) * p_mult
    if t % p_in:
        raise ValueError(f"T={t} must be a multiple of P={p_in}")
    nprog = t // p_in
    # Channel grid: tile channels so the per-program VMEM working set
    # stays bounded at any batch (1024-channel spec shape included);
    # time is the INNER grid dim so the weight tables stay resident.
    # ``cb`` overrides the tile for measured experiments (must divide b).
    if cb <= 0:
        cb = _channel_tile(b)
    elif b % cb:
        raise ValueError(f"cb={cb} does not divide batch {b}")
    G = p_in // down
    nyb = p_in // block + 1         # y blocks per program (1 halo block)
    k2 = down + k - 1
    off = block - (k - 1)           # slab start inside y_ext
    kb = band_k(ntaps, block)
    nt = block // 128
    if gb <= 0:
        gb = max(1, 128 // max(cb, 1))
    # y_ext must cover the last group's padded k2p-lane window.
    k2p = -(-k2 // 128) * 128
    ys_len = off + (G - 1) * down + k2p
    ys_len = -(-ys_len // 128) * 128

    # prev-tail index in (cb, 2·block)-block units: program i's left
    # context starts at x[i·P − 2·block]; clamped to 0 at program 0
    # (those reads are masked by the hist select in the kernel).
    x2_idx = p_in // (2 * block)
    if b == cb:  # single channel tile: keep the 1-D grid (no size-1 dim)
        grid = (nprog,)
        tdim = 0
        pmap = lambda i, _x=x2_idx: (0, jnp.maximum(i * _x - 1, 0))
        xmap = lambda i: (0, i)
        hmap = lambda i: (0, 0)
        omap = lambda i: (0, i)
        wmaps = [(lambda i, _n=w.ndim: (0,) * _n) for w in tables]
    else:
        grid = (b // cb, nprog)
        tdim = 1
        pmap = lambda c, i, _x=x2_idx: (c, jnp.maximum(i * _x - 1, 0))
        xmap = lambda c, i: (c, i)
        hmap = lambda c, i: (c, 0)
        omap = lambda c, i: (c, i)
        wmaps = [(lambda c, i, _n=w.ndim: (0,) * _n) for w in tables]
    wspecs = [
        pl.BlockSpec(w.shape, m, memory_space=pltpu.VMEM)
        for w, m in zip(tables, wmaps)
    ]
    scratch = [pltpu.VMEM((cb, ys_len), jnp.float32)]
    if impl == "v4":
        xs_len = 2 * block + p_in
        if mode == "high":
            scratch += [pltpu.VMEM((cb, xs_len), jnp.bfloat16),
                        pltpu.VMEM((cb, xs_len), jnp.bfloat16)]
        else:
            scratch += [pltpu.VMEM((cb, xs_len), jnp.float32)]
    if rs_batch > 1:
        scratch.append(pltpu.VMEM((rs_batch * cb, k2p), jnp.float32))
    if impl == "v4":
        kern = functools.partial(_kernel_v4, block, kb, nt, nyb, up, down,
                                 k2, G, off, mode, rs_batch, nw, tdim)
    else:
        kern = functools.partial(_kernel, block, kb, nt, nyb, up, down,
                                 k2, G, off, mode, gb, rs_batch, wide,
                                 tdim)
    z = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            # prev-tail: the 2·block of x preceding this program's window
            pl.BlockSpec((cb, 2 * block), pmap, memory_space=pltpu.VMEM),
            # main window: x blocks [i·P, i·P + P)
            pl.BlockSpec((cb, p_in), xmap, memory_space=pltpu.VMEM),
            # carried stream history (program 0's left context)
            pl.BlockSpec((cb, 2 * block), hmap, memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=pl.BlockSpec((cb, G * up), omap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nprog * G * up), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MB VMEM; p_mult=3 at 64 ch peaks at ~100.2 MB
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, x, hist, *tables)
    return z


def fused_fir_resample_pallas(
    x: jnp.ndarray,
    fir_taps,
    up: int,
    down: int,
    rtaps,
    *,
    zi=None,
    return_zf: bool = False,
    mode: str = "high",
    interpret=None,
    gb: int = 0,
    rs_batch: int = 8,
    wide: bool = False,
    p_mult: int = 0,
    impl: str = "v3",
    nw: int = 1,
    cb: int = 0,
):
    """Fused FIR→resample on ``(..., T)`` → ``(..., T·up/down)``.

    Numerically equal (matmul-reassociated) to
    ``resample_poly(fir_filter(x, fir_taps, method="block2"), up, down,
    taps=rtaps)``.  ``zi``: ``(..., 2·block)`` input history (zeros if
    omitted); ``return_zf`` also returns the final history.  Requires
    ``fused_supports(...)`` shapes; ``T`` a multiple of
    :func:`fused_program_in` for exact streaming.
    """
    if interpret is None:  # Mosaic on TPU, interpreter elsewhere (tests)
        interpret = jax.default_backend() not in ("tpu", "axon")
    g = math.gcd(up, down)
    up, down = up // g, down // g
    fir_np = np.asarray(jax.device_get(fir_taps), np.float64)
    r_np = np.asarray(jax.device_get(rtaps), np.float64)
    if len(r_np) % up:
        r_np = np.pad(r_np, (0, up - len(r_np) % up))
    k = len(r_np) // up
    ntaps = len(fir_np)
    block = block2_block(ntaps)
    if impl == "v4" and (wide or (block // 128) % max(nw, 1)):
        # An EXPLICIT v4 request that cannot run must not silently
        # become v3 (ADVICE r4: callers couldn't tell which dataflow
        # ran); only the nw reset is silent-safe (nw=1 is bit-exact).
        raise ValueError(
            f"impl='v4' rejected: "
            + ("wide=True is a v3-only variant"
               if wide else
               f"nw={nw} does not tile the {block // 128} output tiles "
               f"per block (block={block})"))
    tables = fused_tables(fir_np, r_np, up, down, mode, wide=wide,
                          nw=nw if impl == "v4" else 1)

    shape = x.shape
    t = shape[-1]
    xb = x.reshape(-1, t).astype(jnp.float32)
    b = xb.shape[0]
    if zi is None:
        hist = jnp.zeros((b, 2 * block), jnp.float32)
    else:
        hist = zi.reshape(b, 2 * block).astype(jnp.float32)
    if p_mult <= 0:
        # auto: the largest program multiple that divides T within the
        # VMEM envelope (measured v5e: pm=3 fits at 64 ch for v3, pm=4
        # does not; +4% from amortising per-program overheads).  v4 adds
        # the split-once xs scratches (~4 B/lane), so its budget factor
        # is 7.5 — pm=3 at 64 ch crashed the remote TPU compiler (VMEM).
        p0 = fused_program_in(ntaps, up, down)
        cb_est = cb if cb > 0 else _channel_tile(b)
        budget = 7.5 if impl == "v4" else 6
        p_mult = 1
        for pm in (4, 3, 2):
            if t % (p0 * pm) == 0 and cb_est * 4 * p0 * pm * budget <= 100e6:
                p_mult = pm
                break
    # history travels as a separate kernel input — no concat(hist, x)
    # materialisation in HBM (two full signal passes saved per step)
    z = _fused_pallas_jit(
        xb, hist, tables, ntaps=ntaps, up=up, down=down, k=k, mode=mode,
        interpret=interpret, gb=gb, rs_batch=rs_batch, wide=wide,
        p_mult=p_mult, impl=impl, nw=nw, cb=cb,
    )
    n_out = resample_output_len(t, up, down)
    z = z[:, :n_out].reshape(shape[:-1] + (n_out,)).astype(x.dtype)
    if not return_zf:
        return z
    zf = xb[:, -2 * block:].astype(x.dtype).reshape(
        shape[:-1] + (2 * block,)
    )
    return z, zf
