#!/usr/bin/env python
"""Round-5 probe: decompose the channelizer step and measure fusion levers.

VERDICT r4 next-round #1: the 1024-channel channelizer (5907 Msps, mxu
0.59) pays ~16% at the resample->FFT boundary.  This probe measures, on
the real chip, net-of-dispatch (adaptive scan, nonlinear abs probe):

  stage12      fused Pallas FIR+resample alone (z out), 1024 ch
  frames_cur   current frames path on z: two einsums + DC sum + concat
               + complex pack (chains/channelizer.py _frames)
  frames_pair  ONE einsum vs a combined (2048, 2050) [DC|cos|DC0|sin]
               table, (re,im)-pair output, no complex pack
  chain_cur    full current chan.step
  chain_pair   fused stage + frames_pair in one jit

    python bench/r5_probe.py [--channels 1024] [--iters 4]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("LLZ_MATMUL_PRECISION", "high")

import argparse
import json
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--channels", type=int, default=1024)
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from llzlab_tpu.chains.channelizer import Channelizer
    from llzlab_tpu.ops.transform import _rdft_dense_tables

    dev = jax.devices()[0]
    _log(f"backend={jax.default_backend()} {dev.device_kind}")

    @jax.jit
    def _empty(v):
        def body(c, _):
            return c * 1.0000001 + v[0, 0], ()
        c, _ = lax.scan(body, jnp.float32(0), None, length=8)
        return c

    _zb = jnp.zeros((8, 128), jnp.float32)
    _ = np.asarray(_empty(_zb))
    _base = 1e9
    for _i in range(3):
        _t0 = time.perf_counter()
        _ = np.asarray(_empty(_zb))
        _base = min(_base, time.perf_counter() - _t0)
    _log(f"dispatch base: {_base*1e3:.2f} ms")

    def run_scanned(step_fn, state0, x, n):
        def _make_go(length):
            @jax.jit
            def go(v, st):
                def body(carry, _):
                    c, eps = carry
                    out, c2 = step_fn(v + eps, c)
                    if isinstance(out, tuple):
                        e2 = sum(jnp.sum(jnp.abs(o)) for o in out)
                    elif jnp.iscomplexobj(out):
                        e2 = (jnp.sum(jnp.abs(jnp.real(out)))
                              + jnp.sum(jnp.abs(jnp.imag(out))))
                    else:
                        e2 = jnp.sum(jnp.abs(out))
                    return (c2, (e2 * 1e-30).astype(jnp.float32)), ()
                (c, eps), _ = lax.scan(
                    body, (st, jnp.float32(0)), None, length=length)
                return eps
            return go

        go = _make_go(n)
        for _r in range(6):
            _ = np.asarray(go(x, state0))
            best = 1e9
            for _i in range(2):
                t0 = time.perf_counter()
                _ = np.asarray(go(x, state0))
                best = min(best, time.perf_counter() - t0)
            if best >= 6.0 * _base or n >= 100000:
                break
            scale = min(16, max(2, int(6.0 * _base / max(best, 1e-9)) + 1))
            n *= scale
            go = _make_go(n)
        return max(best - _base, 0.05 * best) / n

    chan = Channelizer()
    m = chan.block_multiple()
    c = args.channels
    n_fft = chan.fft_n

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (c, m), jnp.float32)

    x = gen(jax.random.PRNGKey(5))
    x.block_until_ready()
    samples = c * m
    _log(f"channels={c} block={m} samples/step={samples/1e6:.1f}M")

    results = {}

    def rep(name, dt, n_samples=samples):
        msps = n_samples / dt / 1e6
        results[name] = round(msps, 1)
        _log(f"{name:14s} {dt*1e3:8.2f} ms  {msps:9.1f} Msps")

    # ---- A: full current chain step ------------------------------------
    dt = run_scanned(lambda v, st: chan.step(v, st), chan.init_state(c),
                     x, args.iters)
    rep("chain_cur", dt)

    # ---- B: fused stage12 alone ----------------------------------------
    def stage12(v, st):
        z, zf = chan._fused_step(v, st[0])
        return z, (zf, st[1])

    dt12 = run_scanned(stage12, chan.init_state(c), x, args.iters)
    rep("stage12", dt12)

    # ---- C: frames_cur alone on a fixed z ------------------------------
    n_out = m * chan.up // chan.down
    z0 = jax.jit(lambda k: jax.random.normal(k, (c, n_out), jnp.float32))(
        jax.random.PRNGKey(7))
    z0.block_until_ready()

    def frames_cur(v, st):
        return chan._frames(v), st

    dtf = run_scanned(frames_cur, jnp.float32(0), z0, args.iters)
    rep("frames_cur", dtf)

    # ---- D: frames_pair — one einsum, combined table, pair output ------
    Cr, Ci = _rdft_dense_tables(n_fft)  # (n, n/2) each
    W = np.zeros((n_fft, n_fft + 2), np.float32)
    W[:, 0] = 1.0                      # DC (re)
    W[:, 1 : n_fft // 2 + 1] = Cr
    # col n_fft//2+1 stays 0          # DC (im)
    W[:, n_fft // 2 + 2 :] = Ci
    Wj = jnp.asarray(W)

    def frames_pair(v, st):
        nf = v.shape[-1] // n_fft
        zf = v[..., : nf * n_fft].reshape(c * nf, n_fft)
        out = jnp.einsum("zj,jk->zk", zf, Wj,
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGH)
        return out.reshape(c, nf, n_fft + 2), st

    dtp = run_scanned(frames_pair, jnp.float32(0), z0, args.iters)
    rep("frames_pair", dtp)

    # ---- E: chain_pair = stage12 + frames_pair in one jit --------------
    def chain_pair(v, st):
        z, zf = chan._fused_step(v, st[0])
        nf = z.shape[-1] // n_fft
        zf2 = z[..., : nf * n_fft].reshape(c * nf, n_fft)
        out = jnp.einsum("zj,jk->zk", zf2, Wj,
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGH)
        return out.reshape(c, nf, n_fft + 2), (zf, st[1])

    dtc = run_scanned(chain_pair, chan.init_state(c), x, args.iters)
    rep("chain_pair", dtc)

    # ---- F: frames_pair on a bf16 z (handoff experiment) ---------------
    zb16 = z0.astype(jnp.bfloat16)
    zb16.block_until_ready()

    def frames_pair16(v, st):
        nf = v.shape[-1] // n_fft
        zf = v[..., : nf * n_fft].reshape(c * nf, n_fft)
        out = jnp.einsum("zj,jk->zk", zf, Wj,
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGH)
        return out.reshape(c, nf, n_fft + 2), st

    dtb = run_scanned(frames_pair16, jnp.float32(0), zb16, args.iters)
    rep("frames_pair16", dtb)

    print(json.dumps({"probe": "r5_channelizer", "channels": c,
                      "block": m, "dispatch_base_ms": round(_base * 1e3, 2),
                      "msps": results}))


if __name__ == "__main__":
    main()
