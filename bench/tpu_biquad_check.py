import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import scipy.signal as ss
import jax, jax.numpy as jnp
import llzlab_tpu as lz
from llzlab_tpu.kernels.biquad_scan import sosfilt_pallas

def snr(ref, y):
    ref, y = np.asarray(ref, np.float64), np.asarray(y, np.float64)
    e = ref - y; pe = np.sum(e**2)
    return np.inf if pe == 0 else 10*np.log10(np.sum(ref**2)/pe)

rng = np.random.default_rng(0)
sos8 = lz.peaking_eq_sos([100,200,400,800,1600,3200,6400,12800],[3,-4,5,-2,6,-3,2,-5],48000,q=1.0)
C, T = 64, 245760
x = rng.standard_normal((C, T)).astype(np.float32)
xd = jnp.asarray(x)

y_pl, zf = jax.jit(lambda v: sosfilt_pallas(sos8, v, block_size=2048))(xd)
ref = ss.sosfilt(sos8, x[:4].astype(np.float64), axis=-1)
print("pallas TPU vs f64 snr:", snr(ref, np.asarray(y_pl[:4])), flush=True)

# perf: carry state through iterations to serialize, fetch at end
f_pl = jax.jit(lambda v, z: sosfilt_pallas(sos8, v, zi=z, block_size=2048))
f_op = jax.jit(lambda v, z: lz.sosfilt(sos8, v, zi=z, block_size=2048, return_zf=True))
for name, f in [("pallas", f_pl), ("xla-scan", f_op)]:
    y, z = f(xd, jnp.zeros((C, 8, 2)))
    jax.block_until_ready((y, z))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        y, z = f(xd, z)
    jax.block_until_ready((y, z))
    _ = np.asarray(y[0, :8])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms/step -> {C*T/dt/1e6:.0f} Msps", flush=True)
