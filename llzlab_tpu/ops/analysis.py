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

__all__ = ["freqz", "sosfreqz", "group_delay", "spectrogram", "hilbert",
           "periodogram", "welch", "csd", "coherence"]


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


def hilbert(x: jnp.ndarray, n: Optional[int] = None) -> jnp.ndarray:
    """Analytic signal via the frequency-domain Hilbert transform.

    Matches ``scipy.signal.hilbert`` (one-sided spectrum doubling): the
    returned complex signal has ``real == x`` and imag = H{x}.  Device op
    on the full-size FFT (zero-padded/truncated to ``n``).
    """
    from llzlab_tpu.ops import transform as _tf

    t = x.shape[-1]
    n = n or t
    spec = _tf.fft(x.astype(jnp.float32), n)
    h = np.zeros(n, np.float32)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1.0
        h[1 : n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1 : (n + 1) // 2] = 2.0
    return _tf.ifft(spec * jnp.asarray(h), n)


def periodogram(
    x: jnp.ndarray,
    fs: float = 1.0,
    *,
    window: str = "boxcar",
    nfft: Optional[int] = None,
    detrend: bool = True,
) -> Tuple[np.ndarray, jnp.ndarray]:
    """Single-segment power spectral density, scipy semantics.

    Returns ``(f, Pxx)`` with ``Pxx`` shaped ``(..., nfft//2+1)``,
    density-scaled (V²/Hz).  ``window="boxcar"`` and mean detrending are
    the scipy defaults.
    """
    from llzlab_tpu.ops import transform as _tf
    from llzlab_tpu.ops.window import get_window

    t = x.shape[-1]
    nfft = nfft or t
    x = x.astype(jnp.float32)
    if detrend:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
    if window in ("boxcar", "rect", None):
        w = np.ones(t, np.float64)
    else:
        w = get_window(window, t, periodic=False)
    xw = x * jnp.asarray(w.astype(np.float32))
    spec = _tf.rfft(xw, nfft)
    scale = 1.0 / (fs * float(np.sum(w**2)))
    p = (jnp.abs(spec) ** 2) * scale
    # one-sided doubling (all bins except DC and Nyquist-if-even)
    dbl = np.full(nfft // 2 + 1, 2.0, np.float32)
    dbl[0] = 1.0
    if nfft % 2 == 0:
        dbl[-1] = 1.0
    f = np.fft.rfftfreq(nfft, 1.0 / fs)
    return f, p * jnp.asarray(dbl)


def welch(
    x: jnp.ndarray,
    fs: float = 1.0,
    *,
    nperseg: int = 256,
    noverlap: Optional[int] = None,
    window: str = "hann",
    detrend: bool = True,
) -> Tuple[np.ndarray, jnp.ndarray]:
    """Welch PSD estimate (averaged modified periodograms), scipy semantics.

    Device op built on the batched STFT frame path; requires the implied
    hop ``nperseg − noverlap`` to divide ``nperseg`` (scipy's default
    50 % overlap qualifies).  Returns ``(f, Pxx)``.
    """
    from llzlab_tpu.ops import transform as _tf
    from llzlab_tpu.ops.window import get_window
    from llzlab_tpu.ops.spectral import frame

    f, spec, scale, dbl = _welch_segments(
        x, fs, nperseg=nperseg, noverlap=noverlap, window=window,
        detrend=detrend)
    p = (jnp.abs(spec) ** 2) * scale
    return f, jnp.mean(p * dbl, axis=-2)


def _match_lengths(x, y):
    """Zero-pad the shorter of two signals to the longer one's length
    along the last axis (scipy.signal.csd/coherence behavior)."""
    tx, ty = x.shape[-1], y.shape[-1]
    if tx < ty:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, ty - tx)])
    elif ty < tx:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, tx - ty)])
    return x, y


def _welch_segments(x, fs, *, nperseg, noverlap, window, detrend):
    """Shared Welch machinery: windowed per-segment rFFTs plus the
    density scale and one-sided doubling vector."""
    from llzlab_tpu.ops import transform as _tf
    from llzlab_tpu.ops.window import get_window
    from llzlab_tpu.ops.spectral import frame

    noverlap = nperseg // 2 if noverlap is None else noverlap
    hop = nperseg - noverlap
    # scipy.get_window defaults to fftbins=True (periodic) inside welch
    w = get_window(window, nperseg, periodic=True)
    fr = frame(x.astype(jnp.float32), nperseg, hop)  # (..., nf, nperseg)
    if detrend:
        fr = fr - jnp.mean(fr, axis=-1, keepdims=True)
    xw = fr * jnp.asarray(w.astype(np.float32))
    spec = _tf.rfft(xw, nperseg)
    scale = 1.0 / (fs * float(np.sum(w**2)))
    dbl = np.full(nperseg // 2 + 1, 2.0, np.float32)
    dbl[0] = 1.0
    if nperseg % 2 == 0:
        dbl[-1] = 1.0
    f = np.fft.rfftfreq(nperseg, 1.0 / fs)
    return f, spec, scale, jnp.asarray(dbl)


def csd(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fs: float = 1.0,
    *,
    nperseg: int = 256,
    noverlap: Optional[int] = None,
    window: str = "hann",
    detrend: bool = True,
) -> Tuple[np.ndarray, jnp.ndarray]:
    """Cross power spectral density ``P_xy`` (scipy.signal.csd semantics:
    Welch-averaged ``conj(X)·Y``, density-scaled, one-sided)."""
    x, y = _match_lengths(x, y)
    f, sx, scale, dbl = _welch_segments(
        x, fs, nperseg=nperseg, noverlap=noverlap, window=window,
        detrend=detrend)
    _, sy, _, _ = _welch_segments(
        y, fs, nperseg=nperseg, noverlap=noverlap, window=window,
        detrend=detrend)
    p = jnp.conj(sx) * sy * scale
    return f, jnp.mean(p * dbl, axis=-2)


def coherence(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fs: float = 1.0,
    *,
    nperseg: int = 256,
    noverlap: Optional[int] = None,
    window: str = "hann",
    detrend: bool = True,
) -> Tuple[np.ndarray, jnp.ndarray]:
    """Magnitude-squared coherence ``|P_xy|² / (P_xx · P_yy)``
    (scipy.signal.coherence semantics).

    As in scipy, ``P_xx``/``P_yy`` are Welch estimates of each UNPADDED
    input; only the cross term zero-pads the shorter signal (scipy's
    ``coherence`` delegates to ``welch(x)``, ``welch(y)``, ``csd(x, y)``).
    """
    kw = dict(nperseg=nperseg, noverlap=noverlap, window=window,
              detrend=detrend)
    f, sx0, _, _ = _welch_segments(x, fs, **kw)
    _, sy0, _, _ = _welch_segments(y, fs, **kw)
    pxx = jnp.mean(jnp.abs(sx0) ** 2, axis=-2)
    pyy = jnp.mean(jnp.abs(sy0) ** 2, axis=-2)
    xp, yp = _match_lengths(x, y)
    sx, sy = sx0, sy0
    if xp.shape[-1] != x.shape[-1]:
        _, sx, _, _ = _welch_segments(xp, fs, **kw)
    if yp.shape[-1] != y.shape[-1]:
        _, sy, _, _ = _welch_segments(yp, fs, **kw)
    pxy = jnp.mean(jnp.conj(sx) * sy, axis=-2)
    return f, jnp.abs(pxy) ** 2 / (pxx * pyy)
