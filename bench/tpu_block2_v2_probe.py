"""TPU probe v2: highcat (single-dot bf16x3), jt sweep, floor diagnosis."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t0 = time.time()
import jax, jax.numpy as jnp
import numpy as np
from jax import lax

def log(msg):
    print(f"[{time.time()-t0:6.1f}] {msg}", flush=True)

log(f"backend={jax.default_backend()} dev={jax.devices()[0].device_kind}")
import llzlab_tpu as lz
from llzlab_tpu.kernels import block2_fir as bf
import scipy.signal as ss

C, T, ITERS = 64, 245760, 10
block = 1024
taps = lz.firwin(1024, 0.25, window="hamming")
rng = np.random.default_rng(0)
x_np = rng.standard_normal((C, T)).astype(np.float32)
x = jnp.asarray(x_np)
ref = ss.lfilter(taps, [1.0], x_np[:2].astype(np.float64), axis=-1)

def snr(y):
    y = np.asarray(y[:2], np.float64)
    e = ref - y
    return 10*np.log10((ref**2).sum()/(e**2).sum())

def timeit(name, fn, arg, iters=ITERS, t_samp=T):
    @jax.jit
    def go(a):
        def body(c, _):
            return c, fn(a)[0, -1]
        _, probes = lax.scan(body, 0, None, length=iters)
        return probes
    r = go(arg); r.block_until_ready()
    t1 = time.perf_counter()
    r = go(arg); r.block_until_ready()
    dt = time.perf_counter() - t1
    log(f"{name}: {C*t_samp*iters/dt/1e6:8.1f} Msps ({dt/iters*1e3:.3f} ms/step)")

zi = jnp.zeros((C, block), jnp.float32)
xpad = jnp.concatenate([zi, x], axis=1)

for mode, jt in [("highcat", 2), ("highcat", 4), ("high", 4), ("highest", 4)]:
    tb = bf.block2_pallas_tables(taps, block, mode)
    f = jax.jit(lambda xp, tb=tb, mode=mode, jt=jt: bf._block2_pallas_jit(
        xp, tb, block=block, mode=mode, interpret=False, jt=jt))
    y = f(xpad); log(f"pallas-{mode}-jt{jt} SNR {snr(y):.1f} dB")
    timeit(f"pallas-{mode}-jt{jt}", f, xpad)

# floor test: half data, best mode
tb = bf.block2_pallas_tables(taps, block, "highcat")
f = jax.jit(lambda xp: bf._block2_pallas_jit(xp, tb, block=block, mode="highcat", interpret=False, jt=2))
xh = xpad[:, : block + T//2]
timeit("pallas-highcat-halfT", f, xh, t_samp=T//2)

# trivial per-step overhead
fid = jax.jit(lambda a: a * 1.0001)
timeit("trivial-mul", fid, xpad)

# SOL single bf16 matmul, banded-equivalent FLOPs in one dot
s_bf = jnp.zeros((15360, 1152), jnp.bfloat16)
w_bf = jnp.zeros((1152, 1024), jnp.bfloat16)
fm = jax.jit(lambda s: jax.lax.dot_general(s, w_bf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
timeit("SOL-1pass-banded-shape", fm, s_bf)
log("done")
