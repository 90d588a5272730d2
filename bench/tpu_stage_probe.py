import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t0 = time.time()
import jax, jax.numpy as jnp
print(f"[{time.time()-t0:6.1f}] import done", flush=True)
d = jax.devices()
print(f"[{time.time()-t0:6.1f}] devices: {d}", flush=True)
y = jax.jit(lambda v: v * 2 + 1)(jnp.ones((128, 128)))
y.block_until_ready()
print(f"[{time.time()-t0:6.1f}] trivial jit done", flush=True)
import numpy as np
import llzlab_tpu as lz
taps = lz.firwin(1024, 0.25)
x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 245760)).astype(np.float32))
t1 = time.time()
yy = lz.fir_filter(x, taps, method="ols")
yy.block_until_ready()
print(f"[{time.time()-t0:6.1f}] fir OLS compile+run: {time.time()-t1:.1f}s", flush=True)
