"""TPU probe: fused block2 Pallas kernel vs the XLA block2 engine.

One process (the chip is exclusive and each process pays the one-time
~400 s first-D2H stall), on-device lax.scan timing loops.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("LLZ_MATMUL_PRECISION", "high")
t0 = time.time()
import jax, jax.numpy as jnp
import numpy as np
from jax import lax

def log(msg):
    print(f"[{time.time()-t0:6.1f}] {msg}", flush=True)

log(f"backend={jax.default_backend()} dev={jax.devices()[0].device_kind}")

import llzlab_tpu as lz
from llzlab_tpu.ops import fir as fir_mod
from llzlab_tpu.kernels import block2_fir as bf

C, T, ITERS = 64, 245760, 10
block = 1024
taps = lz.firwin(1024, 0.25, window="hamming")
rng = np.random.default_rng(0)
x_np = rng.standard_normal((C, T)).astype(np.float32)
x = jnp.asarray(x_np)

import scipy.signal as ss
ref = ss.lfilter(taps, [1.0], x_np[:2].astype(np.float64), axis=-1)

def snr(y):
    y = np.asarray(y[:2], np.float64)
    e = ref - y
    return 10*np.log10((ref**2).sum()/(e**2).sum())

def timeit(name, fn, *args):
    @jax.jit
    def go(*a):
        def body(c, _):
            return c, fn(*a)[0, -1]
        _, probes = lax.scan(body, 0, None, length=ITERS)
        return probes
    r = go(*args); r.block_until_ready()
    log(f"{name}: compiled+warm")
    t1 = time.perf_counter()
    r = go(*args); r.block_until_ready()
    dt = time.perf_counter() - t1
    msps = C*T*ITERS/dt/1e6
    log(f"{name}: {msps:8.1f} Msps  ({dt/ITERS*1e3:.3f} ms/step)")
    return msps

zi = jnp.zeros((C, block), jnp.float32)
xpad = jnp.concatenate([zi, x], axis=1)

# 1. current XLA block2 (HIGH precision env)
A, Bm = fir_mod._block2_cached(taps.astype(np.float64).tobytes(), block)
f_xla = jax.jit(lambda xp: fir_mod._block2_filter(xp, A, Bm, block))
y = f_xla(xpad); log(f"xla block2 SNR {snr(y):.1f} dB")
timeit("xla-block2-high", f_xla, xpad)

# 2. single stacked einsum variant
W2 = jnp.stack([Bm, A], axis=0)  # (2, block, block)
from llzlab_tpu.ops.transform import matmul_precision
def f_stack(xp):
    b, tp = xp.shape
    t = tp - block
    nblk = t // block
    prev = xp[:, :nblk*block].reshape(b, nblk, block)
    cur = xp[:, block:].reshape(b, nblk, block)
    s = jnp.stack([prev, cur], axis=2)  # (b, nblk, 2, block)
    y = jnp.einsum("bnkm,kmi->bni", s, W2,
                   preferred_element_type=jnp.float32,
                   precision=matmul_precision())
    return y.reshape(b, t)
f_stack = jax.jit(f_stack)
y = f_stack(xpad); log(f"stacked einsum SNR {snr(y):.1f} dB")
timeit("xla-stacked-high", f_stack, xpad)

# 3. pallas high
tb_h = bf.block2_pallas_tables(taps, block, "high")
f_ph = jax.jit(lambda xp: bf._block2_pallas_jit(xp, tb_h, block=block, mode="high", interpret=False))
y = f_ph(xpad); log(f"pallas high SNR {snr(y):.1f} dB")
timeit("pallas-high", f_ph, xpad)

# 4. pallas highest
tb_hh = bf.block2_pallas_tables(taps, block, "highest")
f_phh = jax.jit(lambda xp: bf._block2_pallas_jit(xp, tb_hh, block=block, mode="highest", interpret=False))
y = f_phh(xpad); log(f"pallas highest SNR {snr(y):.1f} dB")
timeit("pallas-highest", f_phh, xpad)

# 5. speed-of-light calibration: same FLOPs as 3 bf16 passes
nblk = T // block
s_bf = jnp.zeros((C*nblk//2, 2*block), jnp.bfloat16)
w_bf = jnp.zeros((2*block, block), jnp.bfloat16)
def f_sol(s, w):
    y = jax.lax.dot_general(s, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y + 0.0
f_sol3 = jax.jit(lambda s, w: f_sol(s, w) + f_sol(s*2, w) + f_sol(s, w*2))
@jax.jit
def go_sol(s, w):
    def body(c, _):
        return c, f_sol3(s, w)[0, -1]
    _, probes = lax.scan(body, 0, None, length=ITERS)
    return probes
r = go_sol(s_bf, w_bf); r.block_until_ready()
t1 = time.perf_counter(); r = go_sol(s_bf, w_bf); r.block_until_ready()
dt = time.perf_counter() - t1
log(f"SOL 3xbf16 matmul only: {C*T*ITERS/dt/1e6:8.1f} Msps-equiv ({dt/ITERS*1e3:.3f} ms/step)")

# 6. chain: pallas FIR + resample
rtaps = lz.resample_taps(147, 160, 64)
def f_chain(xp):
    y = bf._block2_pallas_jit(xp, tb_h, block=block, mode="high", interpret=False)
    z = lz.resample_poly(y, 147, 160, taps=rtaps)
    return z
f_chain = jax.jit(f_chain)
y64 = ss.lfilter(taps, [1.0], x_np[0].astype(np.float64))
z64 = ss.upfirdn(rtaps, y64, 147, 160)
z = f_chain(xpad)
ours = np.asarray(z[0], np.float64); refz = z64[:ours.shape[0]]
log(f"chain pallas SNR {10*np.log10((refz**2).sum()/((refz-ours)**2).sum()):.1f} dB")
timeit("chain-pallas-high", f_chain, xpad)
log("done")
