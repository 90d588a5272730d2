#!/usr/bin/env python
"""Round-4 kernel probe: net (dispatch-subtracted) Msps at long scan.

r4 finding: the axon tunnel costs a FIXED ~25 ms per jitted call
(independent of lax.scan length — measured n=10..640), so every raw
throughput at iters=10-20 underreports by 25-60%.  This probe measures
wall(n=NITERS) − wall(empty, n=NITERS) with NITERS large enough that
residual noise is <2%.

    python bench/r4_probe.py --suite chain,fft [--iters 160]
"""
import sys, os, time, json, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}] {m}", file=sys.stderr, flush=True)

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="chain,fft")
    ap.add_argument("--iters", type=int, default=160)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--block", type=int, default=245760)
    args = ap.parse_args()
    suites = set(args.suite.split(","))

    import jax, jax.numpy as jnp
    from jax import lax
    import scipy.signal as ss
    import llzlab_tpu as lz
    from llzlab_tpu.ops import transform as tr

    log(f"backend={jax.default_backend()} dev={jax.devices()[0].device_kind}")
    C, T, N = args.channels, args.block, args.iters
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((C, T)).astype(np.float32)
    x = jnp.asarray(x_np)

    def _probe(out):
        # nonlinear abs-sum probe (see tpu_sweep.py: a plain sum is
        # collapsible through linear XLA engines)
        s = jnp.sum(jnp.abs(jnp.real(out)))
        if jnp.iscomplexobj(out):
            s = s + jnp.sum(jnp.abs(jnp.imag(out)))
        return (s * 1e-30).astype(jnp.float32)

    def wall(fn, *fargs):
        @jax.jit
        def go(*a):
            def body(c, _):
                return _probe(fn(a[0] + c, *a[1:])), ()
            c, _ = lax.scan(body, jnp.float32(0), None, length=N)
            return c
        r = go(*fargs); r.block_until_ready()
        best = 1e9
        for _ in range(2):
            t1 = time.perf_counter(); r = go(*fargs); np.asarray(r)
            best = min(best, time.perf_counter() - t1)
        return best

    @jax.jit
    def empty(v):
        return v * 1.0000001
    base = wall(empty, x[:, :256])
    log(f"base (empty, n={N}): {base*1e3:.2f} ms")

    def report(**rec):
        print(json.dumps(rec), flush=True); log(json.dumps(rec))

    def net(fn, samples, *fargs):
        w = wall(fn, *fargs)
        dt = max(w - base, 0.05 * w)
        return round(samples * N / dt / 1e6, 1)

    taps = lz.firwin(1024, 0.25, window="hamming")
    rtaps = lz.resample_taps(147, 160, 64)

    if "chain" in suites:
        from llzlab_tpu.kernels import fused_fir_resample as ff
        st0 = jnp.zeros((C, ff.fused_state_len(1024)), jnp.float32)
        variants = [
            ("v3", dict(impl="v3", gb=2, rs_batch=8)),
            ("v4_nw1", dict(impl="v4", nw=1, rs_batch=8)),
            ("v4_nw2", dict(impl="v4", nw=2, rs_batch=8)),
            ("v4_nw4", dict(impl="v4", nw=4, rs_batch=8)),
            ("v4_nw2_rs16", dict(impl="v4", nw=2, rs_batch=16)),
            ("v4_nw2_rs4", dict(impl="v4", nw=2, rs_batch=4)),
        ]
        for name, kw in variants:
            for mode in ("high",):
                @jax.jit
                def cf(v, st=st0, _kw=tuple(kw.items()), _m=mode):
                    z, _ = ff.fused_fir_resample_pallas(
                        v, taps, 147, 160, rtaps, zi=st, return_zf=True,
                        mode=_m, interpret=False, **dict(_kw))
                    return z
                try:
                    report(op="chain", variant=name, mode=mode,
                           msps=net(cf, C * T, x))
                except Exception as e:
                    report(op="chain", variant=name, mode=mode,
                           error=str(e)[:160])

    if "fft" in suites:
        nfft = 2048
        xf = x[:, : (T // nfft) * nfft].reshape(C, -1, nfft)
        samples = xf.shape[0] * xf.shape[1] * nfft
        for prc in ("high", "highest"):
            for eng in ("real", "real16", "dense", "pack"):
                fn = lambda v, _e=eng, _p=prc: tr._jit_pack(
                    *tr._rfft_matmul_jit(v, nfft, _p, _e))
                try:
                    report(op="fft", engine=eng, precision=prc,
                           msps=net(fn, samples, xf))
                except Exception as e:
                    report(op="fft", engine=eng, precision=prc,
                           error=str(e)[:160])
        report(op="fft", engine="xla", precision="n/a",
               msps=net(lambda v: jnp.fft.rfft(v, n=nfft, axis=-1),
                        samples, xf))
    log("done")

if __name__ == "__main__":
    main()
