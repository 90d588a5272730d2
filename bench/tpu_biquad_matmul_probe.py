"""Probe: MXU-matmul biquad cascade vs the XLA-scan engine on real TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import llzlab_tpu as lz
from llzlab_tpu.ops.iir_matmul import sosfilt_matmul

t00 = time.time()
def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)

C, T = 64, 245760
rng = np.random.default_rng(0)
x_np = rng.standard_normal((C, T)).astype(np.float32)
x = jnp.asarray(x_np)
sos = lz.peaking_eq_sos([100,300,700,1500,3000,6000,10000,15000],
                        [3,-4,2,5,-3,4,-2,3], 48000, q=1.0)
log(f"backend={jax.default_backend()}")

import scipy.signal as ss
ref = ss.sosfilt(np.asarray(sos, np.float64), x_np[0].astype(np.float64))

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
        r = check[: ours.shape[0]]
        snr = f"  SNR {10*np.log10(np.sum(r**2)/np.sum((r-ours)**2)):.1f} dB"
    log(f"{name}: {dt*1e3:.2f} ms/step -> {C*T/dt/1e6:.0f} Msps (compile {comp:.0f}s){snr}")

ns = sos.shape[0]
z0 = jnp.zeros((C, ns, 2), jnp.float32)

def mm(L):
    def step(v, st):
        return sosfilt_matmul(sos, v, zi=st, block_size=L, return_zf=True)
    return step

def scan_engine(bs):
    def step(v, st):
        return lz.sosfilt(sos, v, zi=st, block_size=bs, return_zf=True)
    return step

which = os.environ.get("WHICH", "a")
if which == "a":
    bench("scan bs=4096", scan_engine(4096), z0, check=ref)
    for L in (128, 256):
        bench(f"matmul L={L}", mm(L), z0, check=ref)
    os.environ["LLZ_MATMUL_PRECISION"] = "high"
    jax.clear_caches()
    bench("[high] matmul L=128", mm(128), z0, check=ref)
    bench("[high] matmul L=256", mm(256), z0, check=ref)
log("done")
