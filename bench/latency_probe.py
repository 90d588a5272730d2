import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

def probe(name, shape, iters=20):
    x = jnp.zeros(shape, jnp.float32)
    f = jax.jit(lambda v: v * 1.0000001 + 0.0001)
    y = f(x); y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(y)
    y.block_until_ready()
    dt = (time.perf_counter()-t0)/iters
    nbytes = np.prod(shape)*4
    print(f"{name} {shape}: {dt*1e3:.3f} ms/iter, {2*nbytes/dt/1e9:.1f} GB/s", flush=True)

probe("tiny", (8, 128))
probe("1MB", (256, 1024))
probe("16MB", (4096, 1024))
probe("63MB", (64, 245760))
probe("63MB-2d", (15360, 1024))

# matmul peak probe f32 HIGHEST
for prec, label in [(jax.lax.Precision.HIGHEST, "f32-highest"), (jax.lax.Precision.DEFAULT, "bf16-default")]:
    a = jnp.zeros((4096, 4096), jnp.float32)
    f = jax.jit(lambda u: jnp.dot(u, u, precision=prec) * 1e-9)
    y = f(a); y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        y = f(y)
    y.block_until_ready()
    dt = (time.perf_counter()-t0)/10
    fl = 2*4096**3
    print(f"matmul 4096 {label}: {dt*1e3:.2f} ms, {fl/dt/1e12:.1f} TFLOP/s", flush=True)
