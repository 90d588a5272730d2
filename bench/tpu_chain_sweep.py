import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import scipy.signal as ss

prec = os.environ.get("LLZ_MATMUL_PRECISION", "highest")
method = os.environ.get("LLZ_FIR_METHOD", "ols")

import jax, jax.numpy as jnp
from jax import lax
import llzlab_tpu as lz

C, T = 64, 245760
rng = np.random.default_rng(0)
x_np = rng.standard_normal((C, T)).astype(np.float32)
x = jnp.asarray(x_np)
taps = lz.firwin(1024, 0.25, window="hamming")
rtaps = lz.resample_taps(147, 160, 64)
from llzlab_tpu.ops.fir import fir_state_len
hlen = fir_state_len(1024, method=method)

def step(v, f, r):
    y, f2 = lz.fir_filter(v, taps, method=method, zi=f, return_zf=True)
    z, r2 = lz.resample_poly(y, 147, 160, taps=rtaps, zi=r, return_zf=True)
    return z, f2, r2

@jax.jit
def go(v, f0, r0):
    def body(c, _):
        f, r = c
        z, f2, r2 = step(v, f, r)
        return (f2, r2), z[0, -1]
    (f, r), probes = lax.scan(body, (f0, r0), None, length=10)
    return probes

f0 = jnp.zeros((C, hlen)); r0 = jnp.zeros((C, 63))
_ = np.asarray(go(x, f0, r0))
t0 = time.perf_counter()
_ = np.asarray(go(x, f0, r0))
dt = (time.perf_counter()-t0)/10
msps = C*T/dt/1e6
# SNR
z, _, _ = jax.jit(step)(x, f0, r0)
y64 = ss.lfilter(taps, [1.0], x_np[0].astype(np.float64))
z64 = ss.upfirdn(rtaps, y64, 147, 160)
ours = np.asarray(z[0], np.float64); ref = z64[:ours.shape[0]]
snr = 10*np.log10((ref**2).sum()/((ref-ours)**2).sum())
print(f"method={method} precision={prec}: {dt*1e3:.2f} ms/step, {msps:.0f} Msps, SNR {snr:.1f} dB", flush=True)
