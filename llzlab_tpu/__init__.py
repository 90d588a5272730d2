"""llzlab_tpu — a TPU-native DSP framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of the
``templeblock/llzlab`` C audio lab (reference mount at /root/reference was
empty at survey time; the binding spec is /root/repo/BASELINE.json — see
SURVEY.md §0).  Capabilities: FFT/STFT transforms, FIR design + overlap-save
fast convolution, IIR biquad cascades as parallel scans, polyphase rational
resampling, and composed multi-channel chains sharded over TPU meshes.

Layering (SURVEY.md §1b):
    runtime/  — mesh + platform bootstrap           (T0)
    kernels/  — Pallas TPU kernels                  (T1)
    ops/      — user-facing numerical ops           (T2)
    parallel/ — sharding strategies (DP/SP/carry)   (T3)
    pipeline/ — chain composition + streaming       (T4)
    io/, cli/ — WAV I/O and tool frontends          (T5)
"""

__version__ = "0.1.0"

from llzlab_tpu.ops import (  # noqa: F401
    remez,
    fft,
    ifft,
    rfft,
    irfft,
    stft,
    istft,
    firwin,
    fir_filter,
    butter_sos,
    cheby1_sos,
    cheby2_sos,
    ellip_sos,
    bessel_sos,
    iirfilter_sos,
    peaking_eq_sos,
    rbj_biquad,
    sosfilt,
    sosfilt_matmul,
    sosfilt_auto,
    resample_poly,
    resample_taps,
    fir_resample,
    get_window,
    firls,
    minimum_phase,
    filtfilt,
    sosfiltfilt,
    lfilter,
    lfilter_zi,
    sosfilt_zi,
    sosfilt_zi_scan,
)
# imported from the submodule, not llzlab_tpu.ops, so the scipy-named
# function never shadows the ops.resample module
from llzlab_tpu.ops.resample import resample  # noqa: F401
from llzlab_tpu.pipeline import Chain  # noqa: F401
