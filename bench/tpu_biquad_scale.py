import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import llzlab_tpu as lz
from llzlab_tpu.kernels.biquad_scan import sosfilt_pallas

rng = np.random.default_rng(0)
sos8 = lz.peaking_eq_sos([100,200,400,800,1600,3200,6400,12800],[3,-4,5,-2,6,-3,2,-5],48000,q=1.0)
C, T = 64, 245760
x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))

for L in (1024, 2048):
    t0 = time.perf_counter()
    y, zf = jax.jit(lambda v, L=L: sosfilt_pallas(sos8, v, block_size=L))(x)
    y.block_until_ready()
    print(f"8-section L={L} compile+run: {time.perf_counter()-t0:.1f} s", flush=True)

    # on-device timing loop
    def f(v, z, L=L):
        return sosfilt_pallas(sos8, v, zi=z, block_size=L)
    @jax.jit
    def go(v, z0):
        def body(z, _):
            y, z2 = f(v, z)
            return z2, y[0, -1]
        z, probes = lax.scan(body, z0, None, length=10)
        return probes
    z0 = jnp.zeros((C, 8, 2))
    _ = np.asarray(go(x, z0))
    t0 = time.perf_counter()
    _ = np.asarray(go(x, z0))
    dt = (time.perf_counter()-t0)/10
    print(f"  pallas L={L}: {dt*1e3:.2f} ms/step -> {C*T/dt/1e6:.0f} Msps", flush=True)

# XLA scan comparison, on-device loop
@jax.jit
def go_op(v, z0):
    def body(z, _):
        y, z2 = lz.sosfilt(sos8, v, zi=z, block_size=2048, return_zf=True)
        return z2, y[0, -1]
    z, probes = lax.scan(body, z0, None, length=10)
    return probes
z0 = jnp.zeros((C, 8, 2))
_ = np.asarray(go_op(x, z0))
t0 = time.perf_counter()
_ = np.asarray(go_op(x, z0))
dt = (time.perf_counter()-t0)/10
print(f"xla-scan: {dt*1e3:.2f} ms/step -> {C*T/dt/1e6:.0f} Msps", flush=True)
