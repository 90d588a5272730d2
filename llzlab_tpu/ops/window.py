"""Window functions (host-side tap/window generation, f64 internally).

Counterpart of the reference's window tables used in FIR design and STFT
framing (reference expected at llz_fir.c / codec framing; mount empty — spec
anchor BASELINE.json:5,7,10).  Windows are generated in float64 on host and
cast at use sites so that twiddle/tap rounding stays below the -80 dB SNR
budget (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import numpy as np

__all__ = ["get_window", "hann", "hamming", "blackman", "kaiser", "rect"]


def rect(n: int) -> np.ndarray:
    return np.ones(n, dtype=np.float64)


def hann(n: int, periodic: bool = False) -> np.ndarray:
    """Hann window.  ``periodic=True`` gives the DFT-even variant used for
    STFT framing (COLA at 75% overlap); ``False`` gives the symmetric
    filter-design variant."""
    if n == 1:
        return np.ones(1)
    denom = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / denom)


def hamming(n: int, periodic: bool = False) -> np.ndarray:
    if n == 1:
        return np.ones(1)
    denom = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * k / denom)


def blackman(n: int, periodic: bool = False) -> np.ndarray:
    if n == 1:
        return np.ones(1)
    denom = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    w = 2.0 * np.pi * k / denom
    return 0.42 - 0.5 * np.cos(w) + 0.08 * np.cos(2.0 * w)


def kaiser(n: int, beta: float, periodic: bool = False) -> np.ndarray:
    if n == 1:
        return np.ones(1)
    denom = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    arg = beta * np.sqrt(np.clip(1.0 - (2.0 * k / denom - 1.0) ** 2, 0.0, None))
    return np.i0(arg) / np.i0(beta)


_WINDOWS = {
    "rect": lambda n, periodic=False: rect(n),
    "boxcar": lambda n, periodic=False: rect(n),
    "hann": hann,
    "hanning": hann,
    "hamming": hamming,
    "blackman": blackman,
}


def get_window(window, n: int, periodic: bool = False) -> np.ndarray:
    """Resolve a window spec to an ``(n,)`` float64 array.

    ``window`` may be a name (``"hann"``, ``"hamming"``, ``"blackman"``,
    ``"rect"``), a tuple ``("kaiser", beta)``, or an array of length ``n``.
    """
    if isinstance(window, str):
        try:
            return _WINDOWS[window.lower()](n, periodic=periodic)
        except KeyError:
            raise ValueError(f"unknown window {window!r}") from None
    if isinstance(window, tuple):
        name, *params = window
        if name.lower() == "kaiser":
            return kaiser(n, float(params[0]), periodic=periodic)
        raise ValueError(f"unknown window {window!r}")
    arr = np.asarray(window, dtype=np.float64)
    if arr.shape != (n,):
        raise ValueError(f"window array has shape {arr.shape}, expected ({n},)")
    return arr
