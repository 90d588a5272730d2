"""Wideband channelizer — the flagship chain (BASELINE.json:11).

``x (C, T)`` → 1024-tap FIR band-shaping → 147/160 polyphase resample →
2048-point spectral framing, with channels and time-blocks distributed
over the (channel, time) mesh.  The whole step is ONE ``shard_map`` region
under jit: two left-halo ppermutes (FIR history, resampler history) are
the only steady-state communication, both nearest-neighbour on the
``time`` ICI axis; everything else is local MXU work (overlap-save block
conv, polyphase slab matmul, matmul FFT).

Reference counterpart: the per-tool frontends composing llz_fir/
llz_resample/llz_fft in a serial frame loop (mount empty — SURVEY.md §3.5
is the normative call stack for this chain).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from llzlab_tpu.ops import fir as _fir
from llzlab_tpu.ops import resample as _rs
from llzlab_tpu.ops import transform as _tf
from llzlab_tpu.parallel.mesh import CHANNEL_AXIS, TIME_AXIS
from llzlab_tpu.parallel.halo import left_halo, broadcast_from_last

__all__ = ["Channelizer"]


def _lcm(a, b):
    return a * b // math.gcd(a, b)


class Channelizer:
    """FIR → resample → FFT chain, single-device or mesh-sharded.

    Args:
      fir_taps: band-shaping FIR (default 1024-tap 0.4·Nyquist lowpass).
      up, down: resampling ratio (default 147/160 = 48 k→44.1 k).
      fft_n: spectral frame length (default 2048).
      resample_taps: polyphase prototype (default 64 taps/phase design).
      fir_method: "auto" (default — resolves to the measured winner for
        the backend: "fused" on TPU when the fused FIR+resample Pallas
        kernel's static envelope accepts the filter, else "block2" on
        TPU, else "ols" on CPU) | "fused" (single VMEM-resident Pallas
        step, kernels/fused_fir_resample.py) | "ols" | "direct" |
        "block2" (two-matmul Toeplitz).
    """

    def __init__(
        self,
        *,
        fir_taps=None,
        up: int = 147,
        down: int = 160,
        fft_n: int = 2048,
        resample_taps=None,
        taps_per_phase: int = 64,
        fir_method: str = "auto",
        fft_method: str = "auto",
    ):
        if fir_taps is None:
            fir_taps = _fir.firwin(1024, 0.4, window="hamming")
        self.fir_taps = np.asarray(fir_taps, np.float64)
        g = math.gcd(up, down)
        self.up, self.down = up // g, down // g
        if resample_taps is None:
            resample_taps = _rs.resample_taps(self.up, self.down, taps_per_phase)
        rt = np.asarray(resample_taps, np.float64)
        if len(rt) % self.up:
            rt = np.pad(rt, (0, self.up - len(rt) % self.up))
        self.resample_taps = rt
        self.k = len(rt) // self.up
        self.fft_n = fft_n
        ntaps = len(self.fir_taps)
        from llzlab_tpu.kernels import fused_fir_resample as _ff

        on_tpu = jax.default_backend() in ("tpu", "axon")
        if fir_method == "auto":
            if on_tpu and _ff.fused_static_ok(ntaps, self.up, self.down,
                                              self.k):
                fir_method = "fused"
            elif on_tpu and ntaps <= 2048:
                fir_method = "block2"
            else:
                fir_method = "ols"
        self.fir_method = fir_method
        self.fft_method = fft_method
        self.nfft = _fir.default_nfft(ntaps)
        if fir_method == "fused":
            if not _ff.fused_static_ok(ntaps, self.up, self.down, self.k):
                raise ValueError(
                    "fir_method='fused' rejected: filter/ratio outside "
                    "the fused kernel's envelope (see fused_static_ok)"
                )
            # Single combined state: the last 2·block INPUT samples carry
            # both the FIR history and the resampler's y-lookback reach.
            self.h_fir = _ff.fused_state_len(ntaps)
            self.h_rs = 0
        else:
            self.h_fir = _fir.fir_state_len(ntaps, self.nfft, fir_method)
            self.h_rs = self.k - 1

    # ---------------- granularity ----------------

    def block_multiple(self) -> int:
        """Smallest per-shard T granularity satisfying every stage:
        multiple of the OLS hop and of `down`, with the resampled length a
        multiple of fft_n."""
        if self.fir_method == "ols":
            hop = _fir.ols_hop(len(self.fir_taps), self.nfft)
        elif self.fir_method == "block2":
            hop = _fir.block2_block(len(self.fir_taps))
        elif self.fir_method == "fused":
            from llzlab_tpu.kernels import fused_fir_resample as _ff

            hop = _ff.fused_program_in(
                len(self.fir_taps), self.up, self.down)
        else:
            hop = 1
        m = _lcm(hop, self.down)
        # need (m·k)·up/down % fft_n == 0 → k multiple of fft_n/gcd
        per = m * self.up // self.down  # resampled samples per m inputs
        k = self.fft_n // math.gcd(per, self.fft_n)
        return m * k

    # ---------------- state ----------------

    def init_state(self, n_channels: int, dtype=jnp.float32):
        return (
            jnp.zeros((n_channels, self.h_fir), dtype),
            jnp.zeros((n_channels, self.h_rs), dtype),
        )

    # ---------------- single-device step ----------------

    def _fused_mode(self) -> str:
        import os

        return {"highest": "highest", "high": "high", "default": "high"}[
            os.environ.get("LLZ_MATMUL_PRECISION", "highest").lower()
        ]

    def _fused_step(self, x: jnp.ndarray, hist: jnp.ndarray):
        """Fused-engine local compute: ``(x, 2·block input history)`` →
        ``(z, new_history)``.

        Runs the VMEM-resident Pallas kernel when the per-call shapes fit
        its envelope; otherwise an unfused fallback on the SAME state
        layout (the 2·block history is a superset of the block2 FIR
        history, and the resampler's k−1 y-samples are recomputed from
        it — they depend only on the last k−1+ntaps−1 ≤ 2·block inputs).
        """
        from llzlab_tpu.kernels import fused_fir_resample as _ff

        ntaps = len(self.fir_taps)
        c = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        t = x.shape[-1]
        mode = self._fused_mode()
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if _ff.fused_supports(c, ntaps, self.up, self.down, self.k, t):
            z, zf = _ff.fused_fir_resample_pallas(
                x, self.fir_taps, self.up, self.down, self.resample_taps,
                zi=hist, return_zf=True, mode=mode, interpret=not on_tpu,
            )
            return z, zf
        block = _fir.block2_block(ntaps)
        y = _fir.fir_filter(
            x, self.fir_taps, method="block2", zi=hist[..., -block:],
        )
        yh = _fir.fir_filter(hist, self.fir_taps, method="block2")
        rs_zi = yh[..., -(self.k - 1):]
        z = _rs.resample_poly(
            y, self.up, self.down, taps=self.resample_taps, zi=rs_zi,
        )
        zf = jnp.concatenate([hist, x.astype(hist.dtype)],
                             axis=-1)[..., -hist.shape[-1]:]
        return z, zf

    def step(self, x: jnp.ndarray, state):
        """Unsharded pure step: ``(C, T)`` → ``(C, F, fft_n//2+1)``."""
        if self.fir_method == "fused":
            hist, rs_st = state
            z, zf = self._fused_step(x, hist)
            return self._frames(z), (zf, rs_st)
        fir_st, rs_st = state
        y, fir_tail = _fir.fir_filter(
            x, self.fir_taps, method=self.fir_method, nfft=self.nfft,
            zi=fir_st, return_zf=True,
        )
        z, rs_tail = _rs.resample_poly(
            y, self.up, self.down, taps=self.resample_taps, zi=rs_st,
            return_zf=True,
        )
        spec = self._frames(z)
        return spec, (fir_tail, rs_tail)

    def _frames(self, z):
        c = z.shape[0]
        nf = z.shape[-1] // self.fft_n
        zf = z[..., : nf * self.fft_n].reshape(c, nf, self.fft_n)
        return _tf.rfft(zf, self.fft_n, method=self.fft_method)

    # ---------------- sharded step ----------------

    def sharded_step(self, mesh, *, halo: str = "ppermute"):
        """Build the jitted mesh-sharded step: ``(x, state) → (spec, state)``.

        ``x (C, T)`` sharded P(channel, time); state replicated over time.
        Requires ``C % n_channel == 0`` and ``T/n_time`` a multiple of
        :meth:`block_multiple`.

        ``halo``: "ppermute" (XLA collective, any mesh) or "rdma" (Pallas
        ``make_async_remote_copy``, kernels/halo_ring.py) — the RDMA form
        needs a 1-D time-only mesh (jax 0.9 ``dma_start`` limitation, see
        that module's docstring) and falls back to interpret mode off-TPU.
        """
        axes = tuple(mesh.axis_names)
        c_ax = CHANNEL_AXIS if CHANNEL_AXIS in axes else None
        if halo == "rdma":
            if axes != (TIME_AXIS,):
                raise ValueError(
                    "halo='rdma' needs a 1-D (time,) mesh — jax dma_start "
                    "cannot address peers on multi-axis meshes (see "
                    "kernels/halo_ring.py)"
                )
            from llzlab_tpu.kernels.halo_ring import left_halo_ring

            interp = jax.default_backend() not in ("tpu", "axon")

            def halo_fn(v, h, first, cid):
                return left_halo_ring(
                    v, h, axis_names=axes, first_shard_value=first,
                    interpret=interp, collective_id=cid,
                )
        elif halo == "ppermute":
            def halo_fn(v, h, first, cid):
                return left_halo(v, h, first_shard_value=first)
        else:
            raise ValueError(f"unknown halo mode {halo!r}")

        def local(x_l, fir_st, rs_st):
            if self.fir_method == "fused":
                # ONE halo: the 2·block input history carries both the
                # FIR reach and the resampler's y-lookback, so the fused
                # engine halves the chain's steady-state collectives.
                halo = halo_fn(x_l, self.h_fir, fir_st, 13)
                z, _ = self._fused_step(x_l, halo)
                tail = broadcast_from_last(x_l[..., -self.h_fir:])
                return self._frames(z), tail, rs_st
            halo_f = halo_fn(x_l, self.h_fir, fir_st, 13)
            y, _ = _fir.fir_filter(
                x_l, self.fir_taps, method=self.fir_method, nfft=self.nfft,
                zi=halo_f, return_zf=True,
            )
            fir_tail = broadcast_from_last(x_l[..., -self.h_fir:])
            halo_r = halo_fn(y, self.h_rs, rs_st, 14)
            z, _ = _rs.resample_poly(
                y, self.up, self.down, taps=self.resample_taps, zi=halo_r,
                return_zf=True,
            )
            rs_tail = broadcast_from_last(y[..., -self.h_rs:])
            return self._frames(z), fir_tail, rs_tail

        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(c_ax, TIME_AXIS),
                P(c_ax, None),
                P(c_ax, None),
            ),
            out_specs=(
                P(c_ax, TIME_AXIS, None),
                P(c_ax, None),
                P(c_ax, None),
            ),
            check_vma=False,
        )

        @jax.jit
        def step(x, state):
            spec, ft, rt = fn(x, state[0], state[1])
            return spec, (ft, rt)

        return step

    def validate_sharded_shapes(self, mesh, c: int, t: int):
        nc = dict(mesh.shape).get(CHANNEL_AXIS, 1)
        nt = mesh.shape[TIME_AXIS]
        if c % nc:
            raise ValueError(f"C={c} not divisible by n_channel={nc}")
        if t % nt:
            raise ValueError(f"T={t} not divisible by n_time={nt}")
        m = self.block_multiple()
        if (t // nt) % m:
            raise ValueError(
                f"T_loc={t // nt} must be a multiple of {m} "
                f"(OLS hop × down × fft alignment)"
            )
