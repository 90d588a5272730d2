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
      spec_format: "complex" (default) emits complex64 frames
        ``(C, F, fft_n//2+1)``; "pair" emits the TPU-native (re, im)
        pair layout ``(C, F, fft_n+2)`` f32 via ONE combined-table rDFT
        matmul (ops/transform.py rfft_pair) — no second signal read, no
        DC pass, no complex pack.  Measured r5 (1024 ch, v5e): the pair
        frames stage runs 1.63× the complex dense path and lifts the
        whole chain 5786 → 7591 Msps.  Values are identical
        (``pair_to_complex`` converts).
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
        spec_format: str = "complex",
    ):
        if spec_format not in ("complex", "pair"):
            raise ValueError(f"unknown spec_format {spec_format!r}")
        self.spec_format = spec_format
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

    def block_multiple(self, frames: str = "local") -> int:
        """Smallest per-shard T granularity satisfying every stage:
        multiple of the OLS hop and of `down`, with the resampled length a
        multiple of fft_n.

        ``frames="a2a"`` drops the fft_n alignment term: the all-to-all
        framing mode (see :meth:`sharded_step`) reshards to channel-major
        before the FFT, so frames may straddle time-shard boundaries and
        only the FIR/resample granularity remains.
        """
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
        if frames == "a2a":
            return m
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
        if self.spec_format == "pair":
            return _tf.rfft_pair(zf, self.fft_n)
        return _tf.rfft(zf, self.fft_n, method=self.fft_method)

    # ---------------- sharded step ----------------

    def sharded_step(self, mesh, *, halo: str = "ppermute",
                     frames: str = "local", halo_overlap: bool = False):
        """Build the jitted mesh-sharded step: ``(x, state) → (spec, state)``.

        ``x (C, T)`` sharded P(channel, time); state replicated over time.
        Requires ``C % n_channel == 0`` and ``T/n_time`` a multiple of
        :meth:`block_multiple(frames)`.

        ``halo``: "ppermute" (XLA collective, any mesh), "rdma" (Pallas
        ``make_async_remote_copy``, kernels/halo_ring.py — exchange as a
        standalone kernel), or "rdma_fused" (kernels/halo_fir_fused.py —
        the exchange and the block2 FIR live in ONE kernel: the DMA is
        started at grid step 0, interior y-blocks compute while it
        flies, and only the halo-dependent block 0 waits on the receive
        semaphore; needs fir_method='block2').  Both RDMA forms need a
        1-D time-only mesh (jax 0.9 ``dma_start`` limitation, see
        halo_ring.py's docstring) and fall back to interpret mode
        off-TPU.

        ``halo_overlap``: overlap the halo exchange with the bulk FIR
        compute (SURVEY §7 hard part 4).  The stages are linear, so the
        step is split as ``f(halo, x) = f(0, x) + f(halo, 0)`` — the
        collective's result then feeds only a SMALL correction term (one
        block/program of work) while the bulk ``f(0, x)`` has no data
        dependence on it, and XLA's latency-hiding scheduler runs the
        ppermute/RDMA concurrently with the main kernel.  Trade-off: the
        split reassociates f32 additions, so sharded==unsharded holds at
        ~140 dB instead of bit-exactly (hence opt-in).  Supported for
        fir_method "fused" and "block2".

        ``frames``: "local" keeps the FFT framing inside each time shard
        (zero extra communication; needs the resampled per-shard length
        to be a multiple of fft_n).  "a2a" is the Ulysses analog (SURVEY
        §2d): after FIR+resample, ONE all-to-all reshards the signal to
        channel-major — every device then holds full time for a channel
        subset — so spectral frames may straddle time-shard boundaries
        and any FIR/resample-aligned granularity works.  Output sharding:
        P(channel, time, None) for "local", P((channel, time), None,
        None) for "a2a" (requires ``C`` divisible by the total device
        count).
        """
        axes = tuple(mesh.axis_names)
        c_ax = CHANNEL_AXIS if CHANNEL_AXIS in axes else None
        if halo in ("rdma", "rdma_fused"):
            if axes != (TIME_AXIS,):
                raise ValueError(
                    f"halo={halo!r} needs a 1-D (time,) mesh — jax "
                    "dma_start cannot address peers on multi-axis meshes "
                    "(see kernels/halo_ring.py)"
                )
            if halo == "rdma_fused" and self.fir_method != "block2":
                raise ValueError(
                    "halo='rdma_fused' fuses the exchange into the "
                    "block2 FIR kernel — needs fir_method='block2' "
                    f"(got {self.fir_method!r})"
                )
            if halo == "rdma_fused" and halo_overlap:
                raise ValueError(
                    "halo='rdma_fused' already overlaps the exchange "
                    "inside the kernel; halo_overlap does not compose"
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

        if frames not in ("local", "a2a"):
            raise ValueError(f"unknown frames mode {frames!r}")
        emit_frames = frames == "local"
        if halo_overlap and self.fir_method not in ("fused", "block2"):
            raise ValueError(
                "halo_overlap needs fir_method 'fused' or 'block2' "
                f"(got {self.fir_method!r})"
            )

        def local_overlapped(x_l, fir_st, rs_st):
            """f(halo, x) = f(0, x) + f(halo, 0): the collective feeds
            only the correction term, freeing XLA to overlap it with the
            bulk compute."""
            ntaps = len(self.fir_taps)
            block = _fir.block2_block(ntaps)
            if self.fir_method == "fused":
                from llzlab_tpu.kernels import fused_fir_resample as _ff

                halo = halo_fn(x_l, self.h_fir, fir_st, 13)
                p = _ff.fused_program_in(ntaps, self.up, self.down)
                z0, _ = self._fused_step(
                    x_l, jnp.zeros_like(halo))           # bulk, no halo dep
                zc, _ = self._fused_step(
                    jnp.zeros(x_l.shape[:-1] + (p,), x_l.dtype), halo)
                p_out = p * self.up // self.down
                z = z0.at[..., :p_out].add(zc[..., :p_out])
                tail = broadcast_from_last(x_l[..., -self.h_fir:])
                out = self._frames(z) if emit_frames else z
                return out, tail, rs_st
            # block2: y_0 = x_0 @ A + halo @ B — only the B term waits.
            halo_f = halo_fn(x_l, self.h_fir, fir_st, 13)
            _a, bm = _fir._block2_cached(self.fir_taps.tobytes(), block)
            y0, _ = _fir.fir_filter(
                x_l, self.fir_taps, method="block2", zi=None,
                return_zf=True,
            )
            corr = jnp.einsum(
                "...m,mi->...i", halo_f, bm,
                preferred_element_type=jnp.float32,
            ).astype(y0.dtype)
            y = y0.at[..., :block].add(corr)
            fir_tail = broadcast_from_last(x_l[..., -self.h_fir:])
            # resampler halo: same split — zi feeds only the first
            # ceil((k−1)/down) output groups.
            halo_r = halo_fn(y, self.h_rs, rs_st, 14)
            z0, _ = _rs.resample_poly(
                y, self.up, self.down, taps=self.resample_taps, zi=None,
                return_zf=True,
            )
            t0 = self.down * (-(-(self.k - 1) // self.down))
            zc = _rs.resample_poly(
                jnp.zeros(y.shape[:-1] + (t0,), y.dtype), self.up,
                self.down, taps=self.resample_taps, zi=halo_r,
            )
            n0 = zc.shape[-1]
            z = z0.at[..., :n0].add(zc)
            rs_tail = broadcast_from_last(y[..., -self.h_rs:])
            out = self._frames(z) if emit_frames else z
            return out, fir_tail, rs_tail

        def local(x_l, fir_st, rs_st):
            if self.fir_method == "fused":
                # ONE halo: the 2·block input history carries both the
                # FIR reach and the resampler's y-lookback, so the fused
                # engine halves the chain's steady-state collectives.
                halo_v = halo_fn(x_l, self.h_fir, fir_st, 13)
                z, _ = self._fused_step(x_l, halo_v)
                tail = broadcast_from_last(x_l[..., -self.h_fir:])
                out = self._frames(z) if emit_frames else z
                return out, tail, rs_st
            if halo == "rdma_fused":
                # exchange + FIR in ONE overlapped Pallas kernel: the
                # halo DMA flies while the interior y-blocks compute
                # (kernels/halo_fir_fused.py, SURVEY §7 hard part 4)
                import os as _os

                from llzlab_tpu.kernels.halo_fir_fused import (
                    block2_fir_halo_fused,
                )

                prec = {"highest": "highest", "high": "high",
                        "default": "high"}[_os.environ.get(
                            "LLZ_MATMUL_PRECISION", "highest").lower()]
                y = block2_fir_halo_fused(
                    x_l, self.fir_taps, first_shard_value=fir_st,
                    mode=prec, use_rdma=True, collective_id=15,
                )
            else:
                halo_f = halo_fn(x_l, self.h_fir, fir_st, 13)
                y, _ = _fir.fir_filter(
                    x_l, self.fir_taps, method=self.fir_method,
                    nfft=self.nfft, zi=halo_f, return_zf=True,
                )
            fir_tail = broadcast_from_last(x_l[..., -self.h_fir:])
            halo_r = halo_fn(y, self.h_rs, rs_st, 14)
            z, _ = _rs.resample_poly(
                y, self.up, self.down, taps=self.resample_taps, zi=halo_r,
                return_zf=True,
            )
            rs_tail = broadcast_from_last(y[..., -self.h_rs:])
            out = self._frames(z) if emit_frames else z
            return out, fir_tail, rs_tail

        out0_spec = (P(c_ax, TIME_AXIS, None) if emit_frames
                     else P(c_ax, TIME_AXIS))
        fn = jax.shard_map(
            local_overlapped if halo_overlap else local,
            mesh=mesh,
            in_specs=(
                P(c_ax, TIME_AXIS),
                P(c_ax, None),
                P(c_ax, None),
            ),
            out_specs=(
                out0_spec,
                P(c_ax, None),
                P(c_ax, None),
            ),
            check_vma=False,
        )

        if emit_frames:
            @jax.jit
            def step(x, state):
                spec, ft, rt = fn(x, state[0], state[1])
                return spec, (ft, rt)

            return step

        from jax.sharding import NamedSharding

        flat = ((CHANNEL_AXIS, TIME_AXIS) if c_ax is not None
                else (TIME_AXIS,))
        cmajor = NamedSharding(mesh, P(flat, None))

        @jax.jit
        def step_a2a(x, state):
            z, ft, rt = fn(x, state[0], state[1])
            # The Ulysses-analog reshard: XLA emits ONE all-to-all moving
            # the time-sharded resampled signal to channel-major; frames
            # then span the full stream on every device.
            zc = jax.lax.with_sharding_constraint(z, cmajor)
            return self._frames(zc), (ft, rt)

        return step_a2a

    def validate_sharded_shapes(self, mesh, c: int, t: int,
                                frames: str = "local"):
        nc = dict(mesh.shape).get(CHANNEL_AXIS, 1)
        nt = mesh.shape[TIME_AXIS]
        if c % nc:
            raise ValueError(f"C={c} not divisible by n_channel={nc}")
        if t % nt:
            raise ValueError(f"T={t} not divisible by n_time={nt}")
        m = self.block_multiple(frames)
        if (t // nt) % m:
            raise ValueError(
                f"T_loc={t // nt} must be a multiple of {m} "
                f"(OLS hop × down{' × fft' if frames == 'local' else ''}"
                " alignment)"
            )
        if frames == "a2a" and c % math.prod(
                [mesh.shape[a] for a in mesh.axis_names]):
            raise ValueError(
                f"frames='a2a' needs C={c} divisible by the device count"
            )
