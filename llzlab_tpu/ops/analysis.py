"""Analysis utilities: frequency response, spectrogram, group delay.

Reference counterpart: the lab's ad-hoc MATLAB/octave verification of
designs (SURVEY.md §4 — no automated harness upstream).  Here they are
first-class ops so design checks and visual tools share one code path.
Response evaluation is host-side float64 (design-time); the spectrogram
is a device op built on the STFT.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from llzlab_tpu.ops import spectral as _sp

__all__ = ["freqz", "sosfreqz", "group_delay", "spectrogram"]


def freqz(
    b, a=1.0, worN: Union[int, np.ndarray] = 512, fs: float = 2 * np.pi
) -> Tuple[np.ndarray, np.ndarray]:
    """Frequency response of a rational filter, float64 host-side.

    Returns (w, H) with w in the units of ``fs`` over [0, fs/2).
    """
    b = np.atleast_1d(np.asarray(b, np.float64))
    a = np.atleast_1d(np.asarray(a, np.float64))
    if np.isscalar(worN) or np.ndim(worN) == 0:
        w = np.linspace(0.0, np.pi, int(worN), endpoint=False)
    else:
        w = np.asarray(worN, np.float64) * 2 * np.pi / fs
    z = np.exp(-1j * w)
    # H = Σ b[k] z^-k / Σ a[k] z^-k
    zk = np.power(z[:, None], np.arange(len(b))[None, :])
    H = zk @ b
    zk = np.power(z[:, None], np.arange(len(a))[None, :])
    H = H / (zk @ a)
    return w * fs / (2 * np.pi), H


def sosfreqz(
    sos, worN: Union[int, np.ndarray] = 512, fs: float = 2 * np.pi
) -> Tuple[np.ndarray, np.ndarray]:
    """Cascade frequency response (product of biquad responses)."""
    sos = np.asarray(sos, np.float64)
    w = None
    H = 1.0
    for row in sos:
        w, h = freqz(row[:3], row[3:], worN=worN, fs=fs)
        H = H * h
    return w, H


def group_delay(
    b, a=1.0, worN: int = 512, fs: float = 2 * np.pi
) -> Tuple[np.ndarray, np.ndarray]:
    """Group delay −dφ/dω in samples (numerical differentiation of the
    unwrapped phase; robust for the design-verification use case)."""
    w, H = freqz(b, a, worN=worN, fs=fs)
    phase = np.unwrap(np.angle(H))
    w_rad = w * 2 * np.pi / fs
    gd = -np.gradient(phase, w_rad)
    return w, gd


def spectrogram(
    x: jnp.ndarray,
    *,
    n_fft: int = 1024,
    hop: Optional[int] = None,
    window: str = "hann",
    power: float = 2.0,
    log: bool = False,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Magnitude/power spectrogram ``(..., frames, n_fft//2+1)``.

    Device op (batched STFT on the matmul FFT path); ``log=True`` returns
    dB.
    """
    spec = _sp.stft(x, n_fft=n_fft, hop=hop, window=window)
    mag = jnp.abs(spec)
    out = mag if power == 1.0 else mag**power
    if log:
        out = 10.0 * jnp.log10(jnp.maximum(out, eps))
    return out
