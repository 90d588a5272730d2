"""Probe: block2 FIR and fused FIR+resample engines on the real TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import llzlab_tpu as lz
from llzlab_tpu.ops import fir as fir_mod
from llzlab_tpu.ops import fused_chain as fc

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
        _, probes = lax.scan(body, s0, None, length=iters)
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

def fir_b2():
    hl = fir_mod.fir_state_len(1024, method="block2")
    def step(v, st):
        return lz.fir_filter(v, taps, method="block2", zi=st, return_zf=True)
    return step, jnp.zeros((C, hl), jnp.float32)

def fused():
    hl = fc.fir_resample_state_len(1024, 147, 160, len(rtaps))
    def step(v, st):
        return lz.fir_resample(v, taps, 147, 160, rtaps=rtaps, zi=st,
                               return_zf=True)
    return step, jnp.zeros((C, hl), jnp.float32)

def chain_b2():
    hl = fir_mod.fir_state_len(1024, method="block2")
    def step(v, st):
        f, r = st
        y, zf = lz.fir_filter(v, taps, method="block2", zi=f, return_zf=True)
        z, zr = lz.resample_poly(y, 147, 160, taps=rtaps, zi=r, return_zf=True)
        return z, (zf, zr)
    return step, (jnp.zeros((C, hl), jnp.float32),
                  jnp.zeros((C, 63), jnp.float32))

which = os.environ.get("WHICH", "a")
if which == "a":
    s, st = fir_b2(); bench("fir block2", s, st, check=y64)
    s, st = fused(); bench("fused chain", s, st, check=z64)
    s, st = chain_b2(); bench("chain block2+rs", s, st, check=z64)
    os.environ["LLZ_MATMUL_PRECISION"] = "high"
    jax.clear_caches()
    s, st = fir_b2(); bench("[high] fir block2", s, st, check=y64)
    s, st = fused(); bench("[high] fused chain", s, st, check=z64)
log("done")
