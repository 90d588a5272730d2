"""TPU probe: fused FIR+resample Pallas kernel vs the unfused chains.

One process (the chip is exclusive; each process pays the one-time
first-D2H tunnel stall), all timing loops on-device via lax.scan.
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
from llzlab_tpu.ops import resample as rs_mod
from llzlab_tpu.kernels import block2_fir as bf
from llzlab_tpu.kernels import fused_fir_resample as ff

C, T, ITERS = 64, 245760, 10
block = 1024
taps = lz.firwin(1024, 0.25, window="hamming")
rtaps = lz.resample_taps(147, 160, 64)
rng = np.random.default_rng(0)
x_np = rng.standard_normal((C, T)).astype(np.float32)
x = jnp.asarray(x_np)

import scipy.signal as ss
y64 = ss.lfilter(taps, [1.0], x_np[0].astype(np.float64))
z64 = ss.upfirdn(rtaps, y64, 147, 160)

def chain_snr(z):
    ours = np.asarray(z[0], np.float64)
    ref = z64[: ours.shape[0]]
    e = ref - ours
    return 10 * np.log10((ref**2).sum() / (e**2).sum())

def timeit(name, fn, *args):
    @jax.jit
    def go(*a):
        def body(c, _):
            return c, fn(*a)[0, -1]
        _, probes = lax.scan(body, 0, None, length=ITERS)
        return probes
    r = go(*args); r.block_until_ready()
    t1 = time.perf_counter()
    r = go(*args); r.block_until_ready()
    dt = time.perf_counter() - t1
    msps = C * T * ITERS / dt / 1e6
    log(f"{name}: {msps:8.1f} Msps  ({dt/ITERS*1e3:.3f} ms/step)")
    return msps

# ---- 1. current XLA chain (block2 + resample), HIGH env ----------------
hlen = fir_mod.fir_state_len(1024, method="block2")
fir_st = jnp.zeros((C, hlen), jnp.float32)
rs_st = jnp.zeros((C, 63), jnp.float32)

@jax.jit
def chain_xla(x, f, r):
    y, _ = lz.fir_filter(x, taps, method="block2", zi=f, return_zf=True)
    z, _ = lz.resample_poly(y, 147, 160, taps=rtaps, zi=r, return_zf=True)
    return z

z = chain_xla(x, fir_st, rs_st); log(f"xla chain SNR {chain_snr(z):.1f} dB")
timeit("chain-xla-block2-high", chain_xla, x, fir_st, rs_st)

# ---- 2. pallas FIR + XLA resample --------------------------------------
tb_h = bf.block2_pallas_tables(taps, block, "high")
zi2 = jnp.zeros((C, block), jnp.float32)

@jax.jit
def chain_pfir(x, f, r):
    xpad = jnp.concatenate([f, x], axis=1)
    y = bf._block2_pallas_jit(xpad, tb_h, block=block, mode="high",
                              interpret=False)
    z, _ = lz.resample_poly(y, 147, 160, taps=rtaps, zi=r, return_zf=True)
    return z

z = chain_pfir(x, zi2, rs_st); log(f"pallasFIR chain SNR {chain_snr(z):.1f} dB")
timeit("chain-pallasfir-high", chain_pfir, x, zi2, rs_st)

# ---- 3. fused kernel, mode=high: gb × rs_batch sweep --------------------
tb = ff.fused_tables(taps, rtaps, 147, 160, "high")
xh = jnp.concatenate([jnp.zeros((C, 2 * block), jnp.float32), x], axis=1)
for gb, rsb in ((2, 1), (2, 4), (4, 4), (2, 2)):
    f = jax.jit(lambda xh, _gb=gb, _rs=rsb: ff._fused_pallas_jit(
        xh, tb, ntaps=1024, up=147, down=160, k=64, mode="high",
        interpret=False, gb=_gb, rs_batch=_rs))
    try:
        z = f(xh)
        log(f"fused high gb={gb} rsb={rsb} SNR {chain_snr(z):.1f} dB")
        timeit(f"fused-high-gb{gb}-rsb{rsb}", f, xh)
    except Exception as e:
        log(f"fused high gb={gb} rsb={rsb} FAILED: {str(e)[:200]}")

# ---- 4. fused kernel, mode=highest --------------------------------------
tbh = ff.fused_tables(taps, rtaps, 147, 160, "highest")
for rsb in (1, 4):
    fh = jax.jit(lambda xh, _rs=rsb: ff._fused_pallas_jit(
        xh, tbh, ntaps=1024, up=147, down=160, k=64, mode="highest",
        interpret=False, rs_batch=_rs))
    try:
        z = fh(xh)
        log(f"fused highest rsb={rsb} SNR {chain_snr(z):.1f} dB")
        timeit(f"fused-highest-rsb{rsb}", fh, xh)
    except Exception as e:
        log(f"fused highest rsb={rsb} FAILED: {str(e)[:200]}")

# ---- 5. op-level wrapper end-to-end (what bench.py would call) ----------
@jax.jit
def chain_fused_op(x, st):
    z, zf = ff.fused_fir_resample_pallas(
        x, taps, 147, 160, rtaps, zi=st, return_zf=True, mode="high")
    return z

st0 = jnp.zeros((C, 2 * block), jnp.float32)
z = chain_fused_op(x, st0); log(f"fused op SNR {chain_snr(z):.1f} dB")
timeit("fused-op-high", chain_fused_op, x, st0)
log("done")
