import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
d = jax.devices()[0]
for n in (256, 25_600, 256_000, 2_560_000):
    x = jax.device_put(jnp.ones((n,), jnp.float32), d)
    x.block_until_ready()
    t0 = time.perf_counter()
    _ = np.asarray(x)
    dt = time.perf_counter() - t0
    print(f"D2H {n*4/1024:.0f} KB: {dt:.3f}s ({n*4/dt/1e6:.2f} MB/s)", flush=True)
    h = np.ones((n,), np.float32)
    t0 = time.perf_counter()
    y = jax.device_put(h, d); y.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"H2D {n*4/1024:.0f} KB: {dt:.3f}s ({n*4/dt/1e6:.2f} MB/s)", flush=True)
