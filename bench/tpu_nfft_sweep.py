import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import llzlab_tpu as lz
from llzlab_tpu.ops.fir import fir_state_len

C, T = 64, 245760
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
taps = lz.firwin(1024, 0.25, window="hamming")

for nfft in (4096, 8192, 16384):
    h = fir_state_len(1024, nfft)
    def step(v, st, nfft=nfft):
        return lz.fir_filter(v, taps, method="ols", nfft=nfft, zi=st, return_zf=True)
    @jax.jit
    def go(v, s0):
        def body(c, _):
            y, c2 = step(v, c)
            return c2, y[0, -1]
        _, probes = lax.scan(body, s0, None, length=10)
        return probes
    s0 = jnp.zeros((C, h))
    _ = np.asarray(go(x, s0))
    t0 = time.perf_counter()
    _ = np.asarray(go(x, s0))
    dt = (time.perf_counter()-t0)/10
    print(f"fir-only nfft={nfft}: {dt*1e3:.2f} ms/step -> {C*T/dt/1e6:.0f} Msps", flush=True)

# resample-only for reference
rtaps = lz.resample_taps(147, 160, 64)
def rstep(v, st):
    return lz.resample_poly(v, 147, 160, taps=rtaps, zi=st, return_zf=True)
@jax.jit
def gor(v, s0):
    def body(c, _):
        y, c2 = rstep(v, c)
        return c2, y[0, -1]
    _, probes = lax.scan(body, s0, None, length=10)
    return probes
s0 = jnp.zeros((C, 63))
_ = np.asarray(gor(x, s0))
t0 = time.perf_counter()
_ = np.asarray(gor(x, s0))
dt = (time.perf_counter()-t0)/10
print(f"resample-only: {dt*1e3:.2f} ms/step -> {C*T/dt/1e6:.0f} Msps", flush=True)

# sosfilt-only and stft-only for the record
sos8 = lz.peaking_eq_sos([100,200,400,800,1600,3200,6400,12800],[3,-4,5,-2,6,-3,2,-5],48000,q=1.0)
def sstep(v, st):
    return lz.sosfilt(sos8, v, zi=st, block_size=4096, return_zf=True)
@jax.jit
def gos(v, s0):
    def body(c, _):
        y, c2 = sstep(v, c)
        return c2, y[0, -1]
    _, probes = lax.scan(body, s0, None, length=10)
    return probes
s0 = jnp.zeros((C, 8, 2))
_ = np.asarray(gos(x, s0))
t0 = time.perf_counter()
_ = np.asarray(gos(x, s0))
dt = (time.perf_counter()-t0)/10
print(f"sosfilt-only: {dt*1e3:.2f} ms/step -> {C*T/dt/1e6:.0f} Msps", flush=True)
