"""Sharded DSP ops over the (channel, time) mesh (SURVEY.md §2d, §3.5).

Each op distributes ``(C, T)`` multichannel signal blocks with channels on
the ``channel`` axis (pure DP — zero communication) and time on the
``time`` axis (SP with halo exchange / carry composition):

* FIR / resample: state is pure input history → one left-halo ppermute.
* IIR: state is recursive → per-section cross-shard carry composition:
  every shard runs the block scan zero-initialised, the per-shard end
  states are all-gathered (a few floats per channel), composed with the
  host-precomputed f64 transition matrix M = A^{T_loc} in a fixed serial
  order (deterministic bits), and a second pass re-runs the local scan
  from the exact carried state (BASELINE.json:5 "filter-state carries via
  ICI collectives").

Streaming: every op takes/returns a replicated ``state`` so an unbounded
stream can be pushed through the same jitted region super-block by
super-block; shard 0 consumes the carried tail, the last shard's tail is
broadcast back out.

Production shape: every op resolves to a module-level *cached closure*
keyed on (mesh, filter design, shapes) instead of rebuilding the
shard_map region per call (VERDICT r1 weak #6).  Pass ``jitted=True`` to
get the jax.jit-wrapped form whose repeated same-shape calls do not
retrace (``trace_counts`` exposes trace-time counters so tests assert
this).  The default is the eager shard_map form: it re-traces per call
(cheap — the inner ops are themselves jitted) but preserves the
bit-exact sharded==unsharded-streaming contract, which whole-region jit
breaks at the ulp level (XLA refuses the inner ops' compiled boundaries
and reassociates f32 rounding).

Invariance contract (verified in tests/parallel/):
* FIR/resample: sharded == unsharded streaming at ``T_loc`` granularity
  bit-for-bit (pure history state, identical local arithmetic).
* IIR: ≥140 dB vs unsharded (the affine carry composition and XLA's
  batch-width-dependent FMA contraction reorder f32 rounding; exact
  equality across *different compiled shapes* is not promised by XLA on
  any backend).  What IS bit-exact: streaming the sharded op itself —
  same shapes, carried state — reproduces the one-shot sharded run, and
  the carry composition order is fixed, so results are deterministic run
  to run.
"""

from __future__ import annotations

import collections
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from llzlab_tpu.ops import fir as _fir
from llzlab_tpu.ops import iir as _iir
from llzlab_tpu.ops import resample as _rs
from llzlab_tpu.ops import transform as _tf
from llzlab_tpu.parallel.mesh import CHANNEL_AXIS, TIME_AXIS
from llzlab_tpu.parallel.halo import left_halo, broadcast_from_last

__all__ = [
    "fir_filter_sharded",
    "resample_sharded",
    "sosfilt_sharded",
    "fft_frames_sharded",
    "trace_counts",
]

# Incremented at TRACE time inside each op's shard_map body — a cached
# jitted closure re-traces only on new shapes, so tests assert these stay
# flat across repeated same-shape calls.
trace_counts: collections.Counter = collections.Counter()


@functools.lru_cache(maxsize=64)
def _jit_of(fn):
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _fir_sharded_cached(taps_bytes: bytes, mesh, method: str, nfft: int,
                        h: int):
    taps = np.frombuffer(taps_bytes, np.float64)

    def local(x_l, st_l):
        trace_counts["fir"] += 1
        halo = left_halo(x_l, h, first_shard_value=st_l)
        y, _ = _fir.fir_filter(
            x_l, taps, method=method, nfft=nfft, zi=halo, return_zf=True
        )
        tail = broadcast_from_last(x_l[..., -h:])
        return y, tail

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(CHANNEL_AXIS, TIME_AXIS), P(CHANNEL_AXIS, None)),
        out_specs=(P(CHANNEL_AXIS, TIME_AXIS), P(CHANNEL_AXIS, None)),
        check_vma=False,
    )
    return fn


def fir_filter_sharded(
    x: jnp.ndarray,
    taps,
    mesh,
    *,
    method: str = "ols",
    nfft: Optional[int] = None,
    state: Optional[jnp.ndarray] = None,
    return_state: bool = False,
    jitted: bool = False,
):
    """Time+channel-sharded causal FIR filter on ``x (C, T)``.

    ``state``: ``(C, h)`` carried stream history (``h = fir_state_len``);
    zeros when omitted.  Requires ``T/n_time`` to be a multiple of the
    overlap-save hop and ≥ h.  Bit-identical to unsharded streaming at
    ``T_loc`` granularity.
    """
    taps = np.asarray(taps, dtype=np.float64)
    ntaps = len(taps)
    if nfft is None:
        nfft = _fir.default_nfft(ntaps)
    h = _fir.fir_state_len(ntaps, nfft, method)
    nt = mesh.shape[TIME_AXIS]
    t_loc = x.shape[-1] // nt
    if x.shape[-1] % nt:
        raise ValueError(f"T={x.shape[-1]} not divisible by n_time={nt}")
    if t_loc < h:
        raise ValueError(f"T_loc={t_loc} < history {h}")
    if state is None:
        state = jnp.zeros((x.shape[0], h), dtype=x.dtype)
    fn = _fir_sharded_cached(taps.tobytes(), mesh, method, int(nfft), h)
    if jitted:
        fn = _jit_of(fn)
    y, new_state = fn(x, state)
    return (y, new_state) if return_state else y


@functools.lru_cache(maxsize=64)
def _resample_sharded_cached(taps_bytes: bytes, mesh, up: int, down: int,
                             h: int):
    taps = np.frombuffer(taps_bytes, np.float64)

    def local(x_l, st_l):
        trace_counts["resample"] += 1
        halo = left_halo(x_l, h, first_shard_value=st_l)
        y, _ = _rs.resample_poly(
            x_l, up, down, taps=taps, zi=halo, return_zf=True
        )
        tail = broadcast_from_last(x_l[..., -h:])
        return y, tail

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(CHANNEL_AXIS, TIME_AXIS), P(CHANNEL_AXIS, None)),
        out_specs=(P(CHANNEL_AXIS, TIME_AXIS), P(CHANNEL_AXIS, None)),
        check_vma=False,
    )
    return fn


def resample_sharded(
    x: jnp.ndarray,
    up: int,
    down: int,
    mesh,
    *,
    taps=None,
    taps_per_phase: int = 64,
    state: Optional[jnp.ndarray] = None,
    return_state: bool = False,
    jitted: bool = False,
):
    """Time+channel-sharded polyphase resampler on ``x (C, T)``.

    Requires ``T_loc % down == 0`` (group phase realigns at every shard
    boundary, making shard outputs uniform ``T_loc·up/down``).  State is
    the ``K−1``-sample input history.  Bit-identical to unsharded
    streaming at ``T_loc`` granularity.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if taps is None:
        taps = _rs.resample_taps(up, down, taps_per_phase)
    taps = np.asarray(taps, dtype=np.float64)
    if len(taps) % up != 0:
        taps = np.pad(taps, (0, up - len(taps) % up))
    k = len(taps) // up
    h = k - 1
    nt = mesh.shape[TIME_AXIS]
    t_loc = x.shape[-1] // nt
    if x.shape[-1] % nt or t_loc % down:
        raise ValueError(
            f"T_loc={x.shape[-1]}/{nt} must be an integer multiple of down={down}"
        )
    if t_loc < h:
        raise ValueError(f"T_loc={t_loc} < history {h}")
    if state is None:
        state = jnp.zeros((x.shape[0], h), dtype=x.dtype)
    fn = _resample_sharded_cached(taps.tobytes(), mesh, up, down, h)
    if jitted:
        fn = _jit_of(fn)
    y, new_state = fn(x, state)
    return (y, new_state) if return_state else y


@functools.lru_cache(maxsize=64)
def _sosfilt_sharded_cached(sos_bytes: bytes, ns: int, mesh,
                            block_size: int, t_loc: int):
    sos_np = np.frombuffer(sos_bytes, np.float64).reshape(ns, 6)
    kinds, params = _iir.sos_plan(sos_np)
    nt = mesh.shape[TIME_AXIS]
    # Transition of each section over one shard-length, computed in f64.
    with jax.ensure_compile_time_eval():
        trans = [
            jnp.asarray(_iir.section_transition(sos_np[s], t_loc))
            for s in range(ns)
        ]

    def local(x_l, st_l):
        trace_counts["sosfilt"] += 1
        idx = lax.axis_index(TIME_AXIS)
        cur = x_l.astype(jnp.float32)
        tp = _iir.padded_len(t_loc, block_size)
        cur = jnp.pad(cur, ((0, 0), (0, tp - t_loc)))
        zf_out = []
        if nt == 1:
            # Pure channel-DP: no carries to compose — run the exact
            # single-device cascade (bit-identical to ops.sosfilt).
            for s in range(ns):
                cur, zf = _iir.apply_section(
                    kinds[s], params[s], cur, st_l[:, s, :], block_size,
                    zf_index=t_loc - 1,
                )
                zf_out.append(zf)
            return cur[:, :t_loc].astype(x_l.dtype), jnp.stack(zf_out, axis=1)
        for s in range(ns):
            zero = jnp.zeros((cur.shape[0], 2), jnp.float32)
            # Pass 1: zero-init scan → this shard's zero-state end state.
            _, t_j = _iir.apply_section(
                kinds[s], params[s], cur, zero, block_size, zf_index=t_loc - 1
            )
            t_all = lax.all_gather(t_j, TIME_AXIS)  # (nt, C_loc, 2)
            # Fixed-order affine composition: w_{j+1} = M·w_j + t_j.
            M = trans[s]
            acc = st_l[:, s, :]  # stream-carried state enters shard 0
            w_in = acc
            for j in range(nt - 1):
                acc = jnp.einsum("ij,bj->bi", M, acc,
                                 precision=jax.lax.Precision.HIGHEST) + t_all[j]
                w_in = jnp.where(idx == j + 1, acc, w_in)
            zf_global = jnp.einsum("ij,bj->bi", M, acc,
                                   precision=jax.lax.Precision.HIGHEST) + t_all[nt - 1]
            # Pass 2: exact carried state in, true outputs.
            cur, _ = _iir.apply_section(
                kinds[s], params[s], cur, w_in, block_size, zf_index=t_loc - 1
            )
            zf_out.append(zf_global)
        y = cur[:, :t_loc].astype(x_l.dtype)
        return y, jnp.stack(zf_out, axis=1)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(CHANNEL_AXIS, TIME_AXIS), P(CHANNEL_AXIS, None, None)),
        out_specs=(P(CHANNEL_AXIS, TIME_AXIS), P(CHANNEL_AXIS, None, None)),
        check_vma=False,
    )
    return fn


def sosfilt_sharded(
    x: jnp.ndarray,
    sos,
    mesh,
    *,
    block_size: int = 4096,
    state: Optional[jnp.ndarray] = None,
    return_state: bool = False,
    jitted: bool = False,
):
    """Time+channel-sharded biquad cascade on ``x (C, T)``.

    Per section: local zero-init scan → all-gather per-shard end states →
    fixed-order affine composition with the host-precomputed transition
    ``M = A^{T_loc}`` (f64-derived) → second local scan from the exact
    carried state.  Two collectives of ``(C_loc, 2)`` floats per section.
    """
    sos_np = np.ascontiguousarray(np.asarray(sos, dtype=np.float64))
    ns = sos_np.shape[0]
    nt = mesh.shape[TIME_AXIS]
    if x.shape[-1] % nt:
        raise ValueError(f"T={x.shape[-1]} not divisible by n_time={nt}")
    t_loc = x.shape[-1] // nt
    if state is None:
        state = jnp.zeros((x.shape[0], ns, 2), dtype=jnp.float32)
    fn = _sosfilt_sharded_cached(
        sos_np.tobytes(), ns, mesh, int(block_size), t_loc
    )
    if jitted:
        fn = _jit_of(fn)
    y, new_state = fn(x, state)
    return (y, new_state) if return_state else y


@functools.lru_cache(maxsize=64)
def _fft_frames_cached(mesh, n: int, t_loc: int, window, method: str):
    win = None
    if window is not None:
        from llzlab_tpu.ops.window import get_window

        with jax.ensure_compile_time_eval():
            win = jnp.asarray(
                get_window(window, n, periodic=True).astype(np.float32)
            )

    def local(x_l):
        trace_counts["fft_frames"] += 1
        c_loc = x_l.shape[0]
        xf = x_l.reshape(c_loc, t_loc // n, n)
        if win is not None:
            xf = xf * win
        return _tf.rfft(xf, n, method=method)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(CHANNEL_AXIS, TIME_AXIS),
        out_specs=P(CHANNEL_AXIS, TIME_AXIS, None),
        check_vma=False,
    )
    return fn


def fft_frames_sharded(
    x: jnp.ndarray,
    n: int,
    mesh,
    *,
    window=None,
    method: str = "auto",
    jitted: bool = False,
):
    """Frame the time axis into n-point blocks and emit spectra, sharded.

    Frames are whole multiples inside each shard (requires
    ``T_loc % n == 0``) so the channelizer back-end needs no communication
    at all — the a2a reshard only appears when frames must straddle
    shards (parallel/reshard.py).
    """
    nt = mesh.shape[TIME_AXIS]
    t_loc = x.shape[-1] // nt
    if x.shape[-1] % nt or t_loc % n:
        raise ValueError(f"T_loc={t_loc} must be a multiple of n={n}")
    fn = _fft_frames_cached(mesh, int(n), t_loc, window, method)
    if jitted:
        fn = _jit_of(fn)
    return fn(x)
