"""Probe: dense Toeplitz-matmul (im2col) direct FIR on the real TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import llzlab_tpu as lz
from llzlab_tpu.ops import fir as fir_mod

t00 = time.time()
def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)

C, T = 64, 245760
rng = np.random.default_rng(0)
x_np = rng.standard_normal((C, T)).astype(np.float32)
x = jnp.asarray(x_np)
taps = lz.firwin(1024, 0.25, window="hamming")
rtaps = lz.resample_taps(147, 160, 64)
log(f"backend={jax.default_backend()}")

import scipy.signal as ss
y64 = ss.lfilter(taps, [1.0], x_np[0].astype(np.float64))
z64 = ss.upfirdn(rtaps, y64, 147, 160)

def bench(name, step, s0, iters=10, check=None):
    @jax.jit
    def go(v, st):
        def body(c, _):
            y, c2 = step(v, c)
            return c2, jnp.ravel(y)[-1]
        _, probes = lax.scan(body, st, None, length=iters)
        return probes
    t0 = time.perf_counter(); _ = np.asarray(go(x, s0)); comp = time.perf_counter()-t0
    t0 = time.perf_counter(); _ = np.asarray(go(x, s0))
    dt = (time.perf_counter()-t0)/iters
    snr = ""
    if check is not None:
        y0, _ = step(x, s0)
        ours = np.asarray(y0[0], np.float64)
        ref = check[: ours.shape[0]]
        snr = f"  SNR {10*np.log10(np.sum(ref**2)/np.sum((ref-ours)**2)):.1f} dB"
    log(f"{name}: {dt*1e3:.2f} ms/step -> {C*T/dt/1e6:.0f} Msps (compile {comp:.0f}s){snr}")

def fir_step(block):
    def step(v, st):
        tap_mat = fir_mod._toeplitz_matrix(np.asarray(taps, np.float64), block)
        y, zf = fir_mod._fir_filter_im2col_impl(
            v, tap_mat, st, hlen=1023, block=block, return_zf=True)
        return y, zf
    return step, jnp.zeros((C, 1023), jnp.float32)

def chain_step():
    def step(v, st):
        f, r = st
        y, zf = lz.fir_filter(v, taps, method="im2col", zi=f, return_zf=True)
        z, zr = lz.resample_poly(y, 147, 160, taps=rtaps, zi=r, return_zf=True)
        return z, (zf, zr)
    return step, (jnp.zeros((C, 1023), jnp.float32), jnp.zeros((C, 63), jnp.float32))

which = os.environ.get("WHICH", "r1")
if which == "r1":
    for block in (128, 256, 512):
        s, st = fir_step(block)
        bench(f"fir im2col block={block}", s, st, check=y64)
    s, st = chain_step()
    bench("chain im2col block=256", s, st, check=z64)

def chain_step_blk(block):
    def step(v, st):
        f, r = st
        tap_mat = fir_mod._toeplitz_matrix(np.asarray(taps, np.float64), block)
        y, zf = fir_mod._fir_filter_im2col_impl(
            v, tap_mat, f, hlen=1023, block=block, return_zf=True)
        z, zr = lz.resample_poly(y, 147, 160, taps=rtaps, zi=r, return_zf=True)
        return z, (zf, zr)
    return step, (jnp.zeros((C, 1023), jnp.float32), jnp.zeros((C, 63), jnp.float32))

def rs_step():
    def step(v, st):
        z, zr = lz.resample_poly(v, 147, 160, taps=rtaps, zi=st, return_zf=True)
        return z, zr
    return step, jnp.zeros((C, 63), jnp.float32)

if which == "r2":
    for block in (1024, 2048):
        s, st = fir_step(block)
        bench(f"fir im2col block={block}", s, st, check=y64)
    s, st = rs_step()
    bench("resample alone", s, st)
    for block in (512, 1024):
        s, st = chain_step_blk(block)
        bench(f"chain im2col block={block}", s, st, check=z64)
    os.environ["LLZ_MATMUL_PRECISION"] = "high"
    jax.clear_caches()
    s, st = fir_step(1024)
    bench("[high] fir im2col block=1024", s, st, check=y64)
    s, st = chain_step_blk(1024)
    bench("[high] chain im2col block=1024", s, st, check=z64)
log("done")
