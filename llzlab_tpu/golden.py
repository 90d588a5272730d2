"""ctypes bindings for the C++ scalar golden runner (SURVEY.md §2c).

The golden library is the serial "reference implementation" stand-in for
SNR comparisons (BASELINE.json:5) while /root/reference is empty: scalar
C++ loops with double accumulation, single-threaded, no vectorisation on
purpose.  Build on demand with ``ensure_built()`` (g++ is in the image;
pybind11 is not — plain ``extern "C"`` + ctypes keeps the boundary tiny).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")
_LIB_PATH = os.path.join(_DIR, "libgolden.so")
_lib: Optional[ctypes.CDLL] = None

__all__ = [
    "ensure_built",
    "available",
    "fft",
    "fir",
    "sosfilt",
    "upfirdn",
    "rfft",
    "wola_gain",
]


def ensure_built() -> bool:
    """Build libgolden.so if missing; return availability."""
    global _lib
    if _lib is not None:
        return True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "libgolden.so"],
                check=True,
                capture_output=True,
            )
        except Exception:
            return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return False
    c_d = ctypes.POINTER(ctypes.c_double)
    c_f = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.golden_fft.argtypes = [c_d, c_d, i64, ctypes.c_int]
    lib.golden_fir.argtypes = [c_f, i64, c_d, i64, c_d]
    lib.golden_sosfilt.argtypes = [c_d, i64, c_f, i64, c_d]
    lib.golden_upfirdn.argtypes = [c_d, i64, c_f, i64, i64, i64, c_d, i64]
    lib.golden_rfft.argtypes = [c_f, i64, c_d, c_d, c_d]
    lib.golden_wola_gain.argtypes = [c_f, i64, i64, i64, c_d, c_d, c_d,
                                     i64]
    _lib = lib
    return True


def available() -> bool:
    return ensure_built()


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def fft(z: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Complex FFT (power-of-two) via the serial radix-2 golden."""
    ensure_built()
    z = np.asarray(z, np.complex128)
    re = np.ascontiguousarray(z.real)
    im = np.ascontiguousarray(z.imag)
    _lib.golden_fft(_dp(re), _dp(im), re.size, int(inverse))
    out = re + 1j * im
    return out / re.size if inverse else out


def fir(x: np.ndarray, taps: np.ndarray) -> np.ndarray:
    ensure_built()
    x = np.ascontiguousarray(x, np.float32)
    taps = np.ascontiguousarray(taps, np.float64)
    y = np.empty(x.size, np.float64)
    _lib.golden_fir(_fp(x), x.size, _dp(taps), taps.size, _dp(y))
    return y


def sosfilt(sos: np.ndarray, x: np.ndarray) -> np.ndarray:
    ensure_built()
    sos = np.ascontiguousarray(sos, np.float64)
    x = np.ascontiguousarray(x, np.float32)
    y = np.empty(x.size, np.float64)
    _lib.golden_sosfilt(_dp(sos), sos.shape[0], _fp(x), x.size, _dp(y))
    return y


def upfirdn(h: np.ndarray, x: np.ndarray, up: int, down: int) -> np.ndarray:
    ensure_built()
    h = np.ascontiguousarray(h, np.float64)
    x = np.ascontiguousarray(x, np.float32)
    n_out = -(-x.size * up // down)
    y = np.empty(n_out, np.float64)
    _lib.golden_upfirdn(_dp(h), h.size, _fp(x), x.size, up, down, _dp(y), n_out)
    return y


def rfft(x: np.ndarray, window: Optional[np.ndarray] = None) -> np.ndarray:
    ensure_built()
    x = np.ascontiguousarray(x, np.float32)
    n = x.size
    w = np.ascontiguousarray(window, np.float64) if window is not None else None
    out_re = np.empty(n // 2 + 1, np.float64)
    out_im = np.empty(n // 2 + 1, np.float64)
    _lib.golden_rfft(
        _fp(x), n, _dp(w) if w is not None else None, _dp(out_re), _dp(out_im)
    )
    return out_re + 1j * out_im


def wola_gain(x: np.ndarray, gain: np.ndarray, window: np.ndarray,
              n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    """Serial WOLA STFT→gain→iSTFT (the config-4 chain, SURVEY §3.4) in
    double — the C++ independent golden for the cwola/wdft engines.
    1-D ``x``; returns ``n_fft + (nf-1)·hop`` samples."""
    ensure_built()
    x = np.ascontiguousarray(x, np.float32)
    g = np.ascontiguousarray(gain, np.float64)
    w = np.ascontiguousarray(window, np.float64)
    nf = 0 if x.size < n_fft else 1 + (x.size - n_fft) // hop
    out_len = n_fft + (nf - 1) * hop
    y = np.empty(out_len, np.float64)
    _lib.golden_wola_gain(_fp(x), x.size, n_fft, hop, _dp(w), _dp(g),
                          _dp(y), out_len)
    return y
