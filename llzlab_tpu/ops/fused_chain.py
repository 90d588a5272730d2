"""Fused FIR→polyphase-resample chain as one composite polyphase matmul.

The BASELINE.json:2 headline workload is ``resample_poly(fir_filter(x))``.
Both stages are linear, so their composition is a single block-periodic
linear map: for each output group ``s`` (``up`` outputs), the window of
inputs it depends on is the convolution of the FIR taps with the scattered
polyphase bank row —

    z[s, p] = Σ_i G[p, i] · x[s·down + i − offset],
    G[p]    = conv(W_r[p], reverse(h_fir)),  offset = (K−1) + (ntaps−1),

where ``W_r`` is the dense ``(up, down+K−1)`` group weight matrix of
:func:`llzlab_tpu.ops.resample.polyphase_weights`.  Fusing removes the
intermediate FIR output from HBM entirely (the chain becomes compute-bound
on the MXU instead of bouncing a full-rate signal through memory) and the
composite costs barely more FLOPs than the FIR alone
(``up·|G|/down ≈ ntaps`` MACs per input sample).

Evaluated as ``ceil(|G'|/down)`` shifted block matmuls summed — each
operand a zero-copy strided reshape of the padded input, no im2col slab is
ever materialised:

    z = Σ_e  xs[:, e·down : (e+S)·down].reshape(B,S,down) @ G'ᵀ[e·down:…]

Capability parity: composes the reference's ``llz_fir.c`` + ``llz_resample.c``
streaming loops (mount empty — spec anchor BASELINE.json:5,7,8).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from llzlab_tpu.ops.resample import (
    polyphase_weights,
    resample_output_len,
    resample_taps,
)
from llzlab_tpu.ops.transform import matmul_precision as _matmul_precision

__all__ = ["fir_resample", "fir_resample_state_len", "fir_resample_tables",
           "fir_resample_engine"]


@functools.lru_cache(maxsize=16)
def _tables_cached(fir_bytes: bytes, r_bytes: bytes, up: int, down: int):
    h_fir = np.frombuffer(fir_bytes, np.float64)
    rtaps = np.frombuffer(r_bytes, np.float64)
    if len(rtaps) % up != 0:
        rtaps = np.pad(rtaps, (0, up - len(rtaps) % up))
    k = len(rtaps) // up
    w_r = polyphase_weights(rtaps, up, down)  # (up, down+k-1) float64
    ntaps = len(h_fir)
    offset = (k - 1) + (ntaps - 1)
    glen = (down + k - 1) + ntaps - 1
    # W_r rows hold the bank time-reversed (newest input at the highest
    # column), so the composite row is conv with the *reversed* FIR taps.
    g = np.stack([np.convolve(w_r[p], h_fir[::-1]) for p in range(up)])
    hist_parts = -(-offset // down)
    pad_front = hist_parts * down - offset
    gp = np.pad(g, ((0, 0), (pad_front, 0)))
    nparts = -(-gp.shape[1] // down)
    gp = np.pad(gp, ((0, 0), (0, nparts * down - gp.shape[1])))
    assert glen == g.shape[1]
    # (nparts, down, up) float32: part e multiplies input block s+e.
    gparts = gp.reshape(up, nparts, down).transpose(1, 2, 0).astype(np.float32)
    with jax.ensure_compile_time_eval():
        return jnp.asarray(gparts), hist_parts * down


def fir_resample_tables(fir_taps, up: int, down: int, rtaps):
    """Composite weight blocks ``(nparts, down, up)`` and history length."""
    g = math.gcd(up, down)
    up, down = up // g, down // g
    return _tables_cached(
        np.asarray(fir_taps, np.float64).tobytes(),
        np.asarray(rtaps, np.float64).tobytes(),
        up, down,
    )


def fir_resample_state_len(fir_taps_len: int, up: int, down: int,
                           rtaps_len: int, *, engine: str = "composite"
                           ) -> int:
    """Streaming history length (input samples) for :func:`fir_resample`.

    ``engine`` must match the engine the calls will run ("composite" —
    the XLA shifted-matmul path — or "pallas", the fused VMEM-resident
    kernel; their histories differ).  Use :func:`fir_resample_engine` to
    resolve "auto" first.
    """
    if engine == "pallas":
        from llzlab_tpu.kernels.fused_fir_resample import fused_state_len

        return fused_state_len(fir_taps_len)
    g = math.gcd(up, down)
    up, down = up // g, down // g
    k = -(-rtaps_len // up)
    offset = (k - 1) + (fir_taps_len - 1)
    return -(-offset // down) * down


def fir_resample_engine(channels: int, fir_taps_len: int, up: int,
                        down: int, rtaps_len: int, t: int) -> str:
    """Resolve the "auto" engine choice for :func:`fir_resample`.

    Returns "pallas" on TPU when the fused Pallas kernel's shape envelope
    accepts the call (the measured winner: 14.7 vs 8.6 Gsps for the unfused
    XLA chain at 64ch × 245760 on v5e, net of dispatch — r4), else "composite".
    """
    g = math.gcd(up, down)
    up_r, down_r = up // g, down // g
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        return "composite"
    from llzlab_tpu.kernels.fused_fir_resample import fused_supports

    k = -(-rtaps_len // up_r)
    if fused_supports(channels, fir_taps_len, up_r, down_r, k, t):
        return "pallas"
    return "composite"


@functools.partial(jax.jit, static_argnames=("up", "down", "hist_len",
                                             "return_zf"))
def _fir_resample_impl(x, gparts, zi, *, up, down, hist_len, return_zf):
    shape = x.shape
    t = shape[-1]
    xb = x.reshape(-1, t).astype(jnp.float32)
    b = xb.shape[0]
    if zi is None:
        hist = jnp.zeros((b, hist_len), jnp.float32)
    else:
        hist = zi.reshape(b, hist_len).astype(jnp.float32)
    s_groups = -(-t // down)
    nparts = gparts.shape[0]
    stream_len = (s_groups + nparts - 1) * down
    tail = stream_len - hist_len - t
    xs = jnp.concatenate(
        [hist, xb, jnp.zeros((b, max(tail, 0)), jnp.float32)], axis=-1
    )
    if tail < 0:
        xs = xs[:, :stream_len]
    kw = dict(preferred_element_type=jnp.float32,
              precision=_matmul_precision())
    z = None
    for e in range(nparts):
        part = xs[:, e * down : (e + s_groups) * down].reshape(
            b, s_groups, down
        )
        term = jnp.einsum("bsd,dp->bsp", part, gparts[e], **kw)
        z = term if z is None else z + term
    n_out = resample_output_len(t, up, down)
    z = z.reshape(b, s_groups * up)[:, :n_out]
    z = z.reshape(shape[:-1] + (n_out,)).astype(x.dtype)
    if not return_zf:
        return z
    # Final history: the last hist_len *input* samples of (hist ++ signal).
    zf = jnp.concatenate([hist, xb], axis=-1)[:, -hist_len:]
    zf = zf.astype(x.dtype).reshape(shape[:-1] + (hist_len,))
    return z, zf


def fir_resample(
    x: jnp.ndarray,
    fir_taps,
    up: int,
    down: int,
    *,
    rtaps=None,
    taps_per_phase: int = 64,
    zi: Optional[jnp.ndarray] = None,
    return_zf: bool = False,
    engine: str = "auto",
    precision: Optional[str] = None,
):
    """FIR filter + rational resample in one fused MXU pass.

    Numerically equal (same linear map, matmul-reassociated) to

        y = fir_filter(x, fir_taps);  z = resample_poly(y, up, down, rtaps)

    Args:
      x: ``(..., T)`` signal.
      fir_taps: ``(ntaps,)`` host-concrete FIR taps.
      up, down: rational rate factors (reduced by gcd internally).
      rtaps: optional resampler prototype (designed if omitted).
      zi: optional ``(..., fir_resample_state_len(..., engine=E))`` input
        history, where ``E`` is the resolved engine.
      return_zf: also return the final history for streaming continuation.
      engine: "auto" | "pallas" | "composite".  "auto" resolves via
        :func:`fir_resample_engine` — the fused VMEM-resident Pallas
        kernel on TPU when its shape envelope accepts the call (the
        measured winner, BENCH_r02), else the XLA composite matmul.
        NOTE: the two engines carry different history lengths; streaming
        callers should resolve the engine once and pass it explicitly.
      precision: "high" (bf16x3) | "highest" (full f32); default from
        ``LLZ_MATMUL_PRECISION`` (pallas engine only; the composite
        follows the global matmul-precision env).

    Streaming is exact when each fed block has ``T % down == 0``
    (composite) or ``T`` a multiple of
    :func:`llzlab_tpu.kernels.fused_fir_resample.fused_program_in`
    (pallas).
    """
    g = math.gcd(up, down)
    up_r, down_r = up // g, down // g
    if rtaps is None:
        rtaps = resample_taps(up_r, down_r, taps_per_phase)
    if engine == "auto":
        channels = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        engine = fir_resample_engine(
            channels, len(np.asarray(fir_taps)), up_r, down_r,
            len(np.asarray(rtaps)), x.shape[-1])
    if engine == "pallas":
        from llzlab_tpu.kernels.fused_fir_resample import (
            fused_fir_resample_pallas,
        )

        if precision is None:
            import os

            precision = {"highest": "highest", "high": "high",
                         "default": "high"}[
                os.environ.get("LLZ_MATMUL_PRECISION", "highest").lower()
            ]
        return fused_fir_resample_pallas(
            x, fir_taps, up_r, down_r, rtaps, zi=zi, return_zf=return_zf,
            mode=precision,
        )
    if engine != "composite":
        raise ValueError(f"unknown engine {engine!r}")
    gparts, hist_len = fir_resample_tables(fir_taps, up_r, down_r, rtaps)
    return _fir_resample_impl(
        x, gparts, zi, up=up_r, down=down_r, hist_len=hist_len,
        return_zf=return_zf,
    )
