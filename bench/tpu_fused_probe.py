"""Probe: fused matmul OLS vs generic fft OLS on the real TPU chip.

Times FIR-only and the full FIR+resample chain step for each spectral
engine / nfft, using the on-device lax.scan loop pattern (host dispatch
through the tunnel is ~300 ms/call, so every measurement is one dispatch).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import llzlab_tpu as lz
from llzlab_tpu.ops.fir import fir_state_len

t00 = time.time()
def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)

C, T = 64, 245760
rng = np.random.default_rng(0)
x_np = rng.standard_normal((C, T)).astype(np.float32)
x = jnp.asarray(x_np)
taps = lz.firwin(1024, 0.25, window="hamming")
rtaps = lz.resample_taps(147, 160, 64)
log(f"backend={jax.default_backend()}")

import scipy.signal as ss
y64 = ss.lfilter(taps, [1.0], x_np[0].astype(np.float64))
z64 = ss.upfirdn(rtaps, y64, 147, 160)

def bench(name, step, s0, iters=10, check=None):
    @jax.jit
    def go(v, st):
        def body(c, _):
            y, c2 = step(v, c)
            return c2, jnp.ravel(y)[-1]
        _, probes = lax.scan(body, st, None, length=iters)
        return probes
    t0 = time.perf_counter(); _ = np.asarray(go(x, s0)); comp = time.perf_counter()-t0
    t0 = time.perf_counter(); _ = np.asarray(go(x, s0))
    dt = (time.perf_counter()-t0)/iters
    snr = ""
    if check is not None:
        y0, _ = step(x, s0)
        ours = np.asarray(y0[0], np.float64)
        ref = check[: ours.shape[0]]
        snr = f"  SNR {10*np.log10(np.sum(ref**2)/np.sum((ref-ours)**2)):.1f} dB"
    log(f"{name}: {dt*1e3:.2f} ms/step -> {C*T/dt/1e6:.0f} Msps (compile {comp:.0f}s){snr}")

def fir_step(nfft, spectral):
    h = fir_state_len(1024, nfft)
    def step(v, st):
        y, zf = lz.fir_filter(v, taps, method="ols", nfft=nfft,
                              spectral=spectral, zi=st, return_zf=True)
        return y, zf
    return step, jnp.zeros((C, h), jnp.float32)

def chain_step(nfft, spectral):
    h = fir_state_len(1024, nfft)
    def step(v, st):
        f, r = st
        y, zf = lz.fir_filter(v, taps, method="ols", nfft=nfft,
                              spectral=spectral, zi=f, return_zf=True)
        z, zr = lz.resample_poly(y, 147, 160, taps=rtaps, zi=r, return_zf=True)
        return z, (zf, zr)
    return step, (jnp.zeros((C, h), jnp.float32), jnp.zeros((C, 63), jnp.float32))

which = os.environ.get("WHICH", "all")
if which in ("all", "fir"):
    for nfft in (4096, 8192, 16384):
        s, st = fir_step(nfft, "fused")
        bench(f"fir fused nfft={nfft}", s, st, check=y64)
    s, st = fir_step(4096, "fft")
    bench("fir fft   nfft=4096", s, st, check=y64)
if which in ("all", "chain"):
    for nfft in (4096, 8192, 16384):
        s, st = chain_step(nfft, "fused")
        bench(f"chain fused nfft={nfft}", s, st, check=z64)
    s, st = chain_step(4096, "fft")
    bench("chain fft   nfft=4096", s, st, check=z64)
log("done")
