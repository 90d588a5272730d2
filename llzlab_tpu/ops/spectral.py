"""STFT / iSTFT — framing, windowing, batched FFT, overlap-add synthesis.

Capability parity target: the reference's frame loop (copy hop, window,
FFT, per-bin processing, IFFT, overlap-add into an output ring; mount
empty — spec anchor BASELINE.json:10 "STFT→spectral-gain→iSTFT chain,
2048-pt FFT, 75% overlap").

TPU-first design: no per-frame loop and no scatter.  Because the hop
divides the frame length (75% overlap → ratio 4), framing is a reshape to
hop-blocks plus ``ratio`` shifted slices, and overlap-add is the inverse —
``ratio`` shifted padded adds.  Everything batches over (channels, frames)
into single fused XLA regions; the FFT is the MXU-factored matmul path on
TPU (ops/transform.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from llzlab_tpu.ops import transform as _fft
from llzlab_tpu.ops.window import get_window

__all__ = ["stft", "istft", "frame", "overlap_add", "stft_num_frames"]


def stft_num_frames(t: int, n_fft: int, hop: int) -> int:
    if t < n_fft:
        return 0
    return 1 + (t - n_fft) // hop


def frame(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Frame ``(..., T)`` → ``(..., nf, n_fft)``; requires ``hop | n_fft``.

    Built from ``ratio`` shifted slices of the hop-block reshape, which XLA
    fuses into strided loads (no gather, no data-dependent shapes).
    """
    if n_fft % hop != 0:
        raise ValueError(f"hop ({hop}) must divide n_fft ({n_fft})")
    ratio = n_fft // hop
    t = x.shape[-1]
    nf = stft_num_frames(t, n_fft, hop)
    if nf == 0:
        raise ValueError(f"signal length {t} shorter than one frame ({n_fft})")
    nbh = nf - 1 + ratio  # hop-blocks needed
    xb = x[..., : nbh * hop].reshape(x.shape[:-1] + (nbh, hop))
    parts = [xb[..., k : k + nf, :] for k in range(ratio)]
    return jnp.concatenate(parts, axis=-1)


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add ``(..., nf, n_fft)`` → ``(..., n_fft + (nf-1)·hop)``.

    Dense formulation: split each frame into ``ratio`` hop-chunks; chunk k
    of frame i lands on hop-block i+k, so the output is the sum of
    ``ratio`` block-shifted streams — adds and pads only, no scatter.
    """
    n_fft = frames.shape[-1]
    if n_fft % hop != 0:
        raise ValueError(f"hop ({hop}) must divide n_fft ({n_fft})")
    ratio = n_fft // hop
    nf = frames.shape[-2]
    lead = frames.shape[:-2]
    chunks = frames.reshape(lead + (nf, ratio, hop))
    nbh = nf - 1 + ratio
    acc = jnp.zeros(lead + (nbh, hop), dtype=frames.dtype)
    for k in range(ratio):
        pad = [(0, 0)] * len(lead) + [(k, ratio - 1 - k), (0, 0)]
        acc = acc + jnp.pad(chunks[..., :, k, :], pad)
    return acc.reshape(lead + (nbh * hop,))


def _use_wdft(n_fft: int, window, method: str) -> bool:
    """auto-resolve: the frame-free windowed shifted-matmul engine on
    TPU for power-of-two sizes (measured +48-116% on the streaming
    stage — docs/ROOFLINE.md); the framed reference path elsewhere."""
    return (method in ("auto", "wdft")
            and (method == "wdft"
                 or jax.default_backend() in ("tpu", "axon"))
            and n_fft >= 16 and (n_fft & (n_fft - 1)) == 0
            and isinstance(window, str))


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "window", "method", "prec"),
)
def _stft_impl(x, *, n_fft, hop, window, method, prec=None):
    if _use_wdft(n_fft, window, method):
        return windowed_rdft(x.astype(jnp.float32), n_fft, hop, window,
                             prec=prec)
    w = jnp.asarray(
        get_window(window, n_fft, periodic=True).astype(np.float32)
    )
    frames_ = frame(x.astype(jnp.float32), n_fft, hop) * w
    return _fft.rfft(frames_, n_fft, method=method)


@functools.lru_cache(maxsize=16)
def _wdft_tables(n_fft: int, hop: int, window: str, inverse: bool):
    """Window-folded dense rDFT tables for the frame-free shifted-matmul
    STFT/iSTFT (f64 on host, rounded once).

    Forward: W[q][p, k] = w[q·hop+p] · e^{−2πi(q·hop+p)k/n} — the
    windowed DFT is just a modified weight matrix, so the per-frame
    window multiply folds into the matmul at compile time.
    Inverse: V[k][q, p] = scale_k · w[q·hop+p] · e^{+2πi(q·hop+p)k/n}
    with scale = [1, 2, …, 2, 1]/n (conjugate pair folded; imaginary
    rows at DC/Nyquist zeroed per irfft convention) — the synthesis
    window folds the same way.
    """
    w = get_window(window, n_fft, periodic=True).astype(np.float64)
    ratio = n_fft // hop
    j = np.arange(n_fft)
    k = np.arange(n_fft // 2 + 1)
    if not inverse:
        ang = -2.0 * np.pi * np.outer(j, k) / n_fft
        cr = (np.cos(ang) * w[:, None]).astype(np.float32)
        ci = (np.sin(ang) * w[:, None]).astype(np.float32)
        nb = n_fft // 2 + 1
        return (cr.reshape(ratio, hop, nb), ci.reshape(ratio, hop, nb))
    scale = np.full(n_fft // 2 + 1, 2.0 / n_fft)
    scale[0] = scale[-1] = 1.0 / n_fft
    ang = 2.0 * np.pi * np.outer(k, j) / n_fft
    vr = (np.cos(ang) * scale[:, None] * w[None, :]).astype(np.float32)
    vi = (-np.sin(ang) * scale[:, None] * w[None, :]).astype(np.float32)
    vi[0] = 0.0
    vi[-1] = 0.0
    nb = n_fft // 2 + 1
    return (vr.reshape(nb, ratio, hop), vi.reshape(nb, ratio, hop))


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "window", "prec")
)
def _windowed_rdft_jit(x, n_fft, hop, window, prec):
    from llzlab_tpu.ops.transform import _prec_enum

    cr, ci = (jnp.asarray(t) for t in _wdft_tables(n_fft, hop, window,
                                                   False))
    ratio = n_fft // hop
    shape = x.shape
    t = shape[-1]
    nf = stft_num_frames(t, n_fft, hop)
    nbh = nf - 1 + ratio
    xb = x[..., : nbh * hop].reshape(-1, nbh, hop).astype(jnp.float32)
    kw = dict(preferred_element_type=jnp.float32,
              precision=_prec_enum(prec))
    xr = xi = None
    for q in range(ratio):
        seg = xb[:, q : q + nf, :]
        tr = jnp.einsum("zfp,pk->zfk", seg, cr[q], **kw)
        ti = jnp.einsum("zfp,pk->zfk", seg, ci[q], **kw)
        xr = tr if xr is None else xr + tr
        xi = ti if xi is None else xi + ti
    nb = n_fft // 2 + 1
    out_shape = shape[:-1] + (nf, nb)
    return xr.reshape(out_shape), xi.reshape(out_shape)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "window", "prec")
)
def _windowed_irdft_ola_jit(sr, si, n_fft, hop, window, prec):
    from llzlab_tpu.ops.transform import _prec_enum

    vr, vi = (jnp.asarray(t) for t in _wdft_tables(n_fft, hop, window,
                                                   True))
    ratio = n_fft // hop
    shape = sr.shape
    nf, nb = shape[-2], shape[-1]
    srb = sr.reshape(-1, nf, nb).astype(jnp.float32)
    sib = si.reshape(-1, nf, nb).astype(jnp.float32)
    kw = dict(preferred_element_type=jnp.float32,
              precision=_prec_enum(prec))
    nbh = nf - 1 + ratio
    acc = jnp.zeros((srb.shape[0], nbh, hop), jnp.float32)
    for q in range(ratio):
        z = (jnp.einsum("zfk,kp->zfp", srb, vr[:, q, :], **kw)
             + jnp.einsum("zfk,kp->zfp", sib, vi[:, q, :], **kw))
        acc = acc.at[:, q : q + nf, :].add(z)
    return acc.reshape(shape[:-2] + (nbh * hop,))


def _check_wdft_shapes(t: int, n_fft: int, hop: int):
    """Mirror frame()'s validation (ADVICE r4: a non-dividing hop used
    to die with an opaque reshape error inside the table builder, and
    t < n_fft silently returned zero frames)."""
    if n_fft % hop != 0:
        raise ValueError(f"hop ({hop}) must divide n_fft ({n_fft})")
    if t < n_fft:
        raise ValueError(
            f"signal length {t} shorter than one frame ({n_fft})")


def windowed_rdft(x: jnp.ndarray, n_fft: int, hop: int,
                  window: str = "hann",
                  prec: Optional[str] = None) -> jnp.ndarray:
    """``rfft(frame(x)·w)`` WITHOUT materialising frames: ``ratio``
    shifted matmuls on the hop-block reshape, window folded into the
    DFT tables (``frame`` expands the data 4× at 75% overlap and the
    window costs an extra VPU pass over it — both gone here; the same
    shifted-matmul trick as ops/fused_chain.py)."""
    from llzlab_tpu.ops.transform import (_jit_pack,
                                          matmul_precision_name)

    _check_wdft_shapes(x.shape[-1], n_fft, hop)
    xr, xi = _windowed_rdft_jit(
        x, n_fft, hop, window, prec or matmul_precision_name())
    return _jit_pack(xr, xi)


def windowed_irdft_ola(spec: jnp.ndarray, n_fft: int, hop: int,
                       window: str = "hann",
                       prec: Optional[str] = None) -> jnp.ndarray:
    """``overlap_add(irfft(spec)·w, hop)`` via ``ratio`` shifted matmuls
    with the synthesis window folded into the inverse tables (no frame
    materialisation; envelope normalisation is the caller's)."""
    from llzlab_tpu.ops.transform import (_jit_split,
                                          matmul_precision_name)

    if n_fft % hop != 0:
        raise ValueError(f"hop ({hop}) must divide n_fft ({n_fft})")
    sr, si = _jit_split(spec)
    return _windowed_irdft_ola_jit(
        sr, si, n_fft, hop, window, prec or matmul_precision_name())


# ---------------------------------------------------------------------------
# Composed WOLA: analysis → static gain → synthesis as ONE frame map
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _cwola_tables(n_fft: int, hop: int, window: str,
                  gain_bytes: bytes) -> np.ndarray:
    """The whole ``diag(w)·DFT·diag(g)·iDFT·diag(w)`` per-frame linear
    map composed on host in float64 into ONE real ``(n_fft, n_fft)``
    matrix (r5, VERDICT r4 #2): for a STATIC per-bin gain the wdft
    engine's two dense windowed-rDFT passes (2·2·n·(n/2+1) MACs/frame)
    collapse to a single frame matmul (n² MACs/frame — 2.0× fewer at
    n=2048) with no intermediate spectrum in HBM and one fewer
    rounding site.  Returned reshaped ``(ratio, hop, ratio, hop)`` for
    the shifted-matmul dataflow."""
    w = get_window(window, n_fft, periodic=True).astype(np.float64)
    g = np.frombuffer(gain_bytes, np.float64)
    nb = n_fft // 2 + 1
    if g.shape != (nb,):
        raise ValueError(f"gain must have {nb} bins, got {g.shape}")
    j = np.arange(n_fft)
    k = np.arange(nb)
    ang = -2.0 * np.pi * np.outer(j, k) / n_fft
    cr = np.cos(ang) * w[:, None]          # analysis re (n, nb)
    ci = np.sin(ang) * w[:, None]          # analysis im
    scale = np.full(nb, 2.0 / n_fft)
    scale[0] = scale[-1] = 1.0 / n_fft
    vr = np.cos(-ang.T) * scale[:, None] * w[None, :]   # (nb, n)
    vi = np.sin(ang.T) * scale[:, None] * w[None, :]
    vi[0] = 0.0
    vi[-1] = 0.0
    m = cr @ (g[:, None] * vr) + ci @ (g[:, None] * vi)
    ratio = n_fft // hop
    return (m.astype(np.float32)
            .reshape(ratio, hop, ratio, hop))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "prec"))
def _cwola_apply_jit(x, mask, mtab, n_fft, hop, prec):
    from llzlab_tpu.ops.transform import _prec_enum

    ratio = n_fft // hop
    shape = x.shape
    t = shape[-1]
    nf = stft_num_frames(t, n_fft, hop)
    nbh = nf - 1 + ratio
    xb = x[..., : nbh * hop].reshape(-1, nbh, hop).astype(jnp.float32)
    kw = dict(preferred_element_type=jnp.float32,
              precision=_prec_enum(prec))
    acc = jnp.zeros((xb.shape[0], nbh, hop), jnp.float32)
    for q in range(ratio):
        # row f of seg is frame f's q-th hop-chunk; the per-frame mask
        # commutes with the linear map, so it rides on the input chunk
        seg = xb[:, q : q + nf, :] * mask[None, :, None]
        for qp in range(ratio):
            z = jnp.einsum("zfp,pr->zfr", seg, mtab[q, :, qp, :], **kw)
            acc = acc.at[:, qp : qp + nf, :].add(z)
    return acc.reshape(shape[:-1] + (nbh * hop,))


def composed_wola(x: jnp.ndarray, mask: jnp.ndarray, n_fft: int,
                  hop: int, window: str, gain: np.ndarray,
                  prec: Optional[str] = None) -> jnp.ndarray:
    """WOLA ``overlap_add(istft_frame(gain · stft_frame(x)))`` for a
    STATIC per-bin gain via the composed frame map (``_cwola_tables``).
    ``mask``: per-frame (nf,) weight applied to each frame's
    contribution (stream-start zero-pad masking — commutes with the
    composed linear map).  Envelope normalisation is the caller's.
    Output ``(..., ov + t)`` like :func:`windowed_irdft_ola` on the
    full frame set."""
    from llzlab_tpu.ops.transform import matmul_precision_name

    _check_wdft_shapes(x.shape[-1], n_fft, hop)
    mtab = jnp.asarray(_cwola_tables(
        n_fft, hop, window,
        np.ascontiguousarray(gain, np.float64).tobytes()))
    return _cwola_apply_jit(x, mask, mtab, n_fft, hop,
                            prec or matmul_precision_name())


def stft(
    x: jnp.ndarray,
    *,
    n_fft: int = 2048,
    hop: Optional[int] = None,
    window="hann",
    method: str = "auto",
) -> jnp.ndarray:
    """STFT along the last axis: ``(..., T)`` → complex ``(..., nf, n_fft//2+1)``.

    Causal framing anchored at sample 0 (no centre padding — streaming
    blocks at hop multiples concatenate exactly).  Default 2048-pt frames,
    75% overlap (hop 512), periodic Hann — the BASELINE.json:10 config.
    """
    hop = hop or n_fft // 4
    from llzlab_tpu.ops.transform import matmul_precision_name

    return _stft_impl(x, n_fft=n_fft, hop=hop, window=window,
                      method=method, prec=matmul_precision_name())


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "window", "method", "length", "prec"),
)
def _istft_impl(spec, *, n_fft, hop, window, method, length, prec=None):
    w = jnp.asarray(
        get_window(window, n_fft, periodic=True).astype(np.float32)
    )
    if _use_wdft(n_fft, window, method):
        y = windowed_irdft_ola(spec, n_fft, hop, window, prec=prec)
    else:
        frames_ = _fft.irfft(spec, n_fft, method=method) * w
        y = overlap_add(frames_, hop)
    nf = spec.shape[-2]
    # Window-square envelope (same OLA); constant = COLA sum in the interior.
    wsq = jnp.broadcast_to(w * w, (nf, n_fft))
    env = overlap_add(wsq, hop)
    y = y / jnp.maximum(env, 1e-8)
    if length is not None:
        y = y[..., :length]
    return y


def istft(
    spec: jnp.ndarray,
    *,
    n_fft: int = 2048,
    hop: Optional[int] = None,
    window="hann",
    method: str = "auto",
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT with windowed overlap-add and COLA envelope division.

    ``istft(stft(x))`` reconstructs x exactly (≥140 dB) away from the first
    and last ``n_fft - hop`` samples, where the analysis window taper is
    divided out by the envelope.
    """
    hop = hop or n_fft // 4
    from llzlab_tpu.ops.transform import matmul_precision_name

    return _istft_impl(
        spec, n_fft=n_fft, hop=hop, window=window, method=method,
        length=length, prec=matmul_precision_name()
    )
