import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
import llzlab_tpu as lz
from llzlab_tpu.ops import transform as tf
from llzlab_tpu.ops import fir as fir_mod

C, T = 64, 245760
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
taps = lz.firwin(1024, 0.25)
rtaps = lz.resample_taps(147, 160, 64)
sos8 = lz.peaking_eq_sos([100,200,400,800,1600,3200,6400,12800],[3,-4,5,-2,6,-3,2,-5],48000,q=1.0)

def timeit_chained(name, fn, x, iters=10, scale=None):
    y = fn(x); y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)  # serialize via data dependency
    y.block_until_ready()
    _ = np.asarray(y[0,:4])
    dt = (time.perf_counter()-t0)/iters
    extra = f" -> {scale/dt/1e6:.0f} Msps" if scale else ""
    print(f"{name}: {dt*1e3:.2f} ms{extra}", flush=True)
    return dt

# elementwise roundtrip
dt = timeit_chained("elementwise x*2+1", jax.jit(lambda v: v*2.0+1.0), x0)
print(f"  eff GB/s: {2*C*T*4/dt/1e9:.0f}")

# fir OLS (shape-preserving)
timeit_chained("fir OLS", jax.jit(lambda v: fir_mod.fir_filter(v, taps, method="ols")), x0, scale=C*T)
timeit_chained("fir direct", jax.jit(lambda v: fir_mod.fir_filter(v, taps, method="direct")), x0, scale=C*T)
timeit_chained("sosfilt8", jax.jit(lambda v: lz.sosfilt(sos8, v)), x0, scale=C*T)
timeit_chained("stft-istft", jax.jit(lambda v: lz.istft(lz.stft(v), length=T)), x0, scale=C*T)

# rfft (not shape-preserving): chain via irfft roundtrip
f = jax.jit(lambda v: tf.irfft(tf.rfft(v, 4096), 4096))
frames = jnp.asarray(rng.standard_normal((5120, 4096)).astype(np.float32))
dt = timeit_chained("rfft+irfft (5120,4096)", f, frames, scale=5120*4096)

# resample: chain by re-using output padded back to T
def rs_round(v):
    z = lz.resample_poly(v, 147, 160, taps=rtaps)
    return jnp.pad(z, ((0,0),(0,T - z.shape[-1])))
timeit_chained("resample(+pad)", jax.jit(rs_round), x0, scale=C*T)
