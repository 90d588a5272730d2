import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import llzlab_tpu as lz
from llzlab_tpu.ops.fir import fir_state_len

C, T = 64, 245760
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
taps = lz.firwin(1024, 0.25, window="hamming")
rtaps = lz.resample_taps(147, 160, 64)
sos8 = lz.peaking_eq_sos([100,200,400,800,1600,3200,6400,12800],[3,-4,5,-2,6,-3,2,-5],48000,q=1.0)

def bench(name, step, s0):
    @jax.jit
    def go(v, st):
        def body(c, _):
            y, c2 = step(v, c)
            return c2, jnp.ravel(y)[-1]
        _, probes = lax.scan(body, st, None, length=10)
        return probes
    t0 = time.perf_counter(); _ = np.asarray(go(x, s0)); comp = time.perf_counter()-t0
    t0 = time.perf_counter(); _ = np.asarray(go(x, s0))
    dt = (time.perf_counter()-t0)/10
    print(f"{name}: {dt*1e3:.2f} ms/step -> {C*T/dt/1e6:.0f} Msps (compile {comp:.0f}s)", flush=True)

which = os.environ.get("WHICH", "all")
if which in ("all", "fir"):
    bench("fir nfft=4096", lambda v, st: lz.fir_filter(v, taps, method="ols", nfft=4096, zi=st, return_zf=True), jnp.zeros((C, fir_state_len(1024, 4096))))
if which in ("all", "fir8"):
    bench("fir nfft=8192", lambda v, st: lz.fir_filter(v, taps, method="ols", nfft=8192, zi=st, return_zf=True), jnp.zeros((C, fir_state_len(1024, 8192))))
if which in ("all", "rs"):
    bench("resample", lambda v, st: lz.resample_poly(v, 147, 160, taps=rtaps, zi=st, return_zf=True), jnp.zeros((C, 63)))
if which in ("all", "sos"):
    bench("sosfilt", lambda v, st: lz.sosfilt(sos8, v, zi=st, block_size=4096, return_zf=True), jnp.zeros((C, 8, 2)))
if which in ("all", "stft"):
    gain = jnp.ones((1025,), jnp.float32)
    bench("stft-gain-istft", lambda v, st: (lz.istft(lz.stft(v)*gain, length=T), st), jnp.zeros((1,)))
