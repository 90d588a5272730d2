"""AOT-compile the OLS paths for TPU and dump XLA cost analysis.

No device execution — just lower+compile, then print bytes-accessed /
flops / estimated time per variant, plus the largest fusions, to see
where the HBM traffic goes.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import llzlab_tpu as lz
from llzlab_tpu.ops.fir import fir_state_len

C, T = 64, 245760
taps = lz.firwin(1024, 0.25, window="hamming")
x = jax.ShapeDtypeStruct((C, T), jnp.float32)

def report(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    comp = lowered.compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    by = ca.get("bytes accessed", float("nan"))
    fl = ca.get("flops", float("nan"))
    print(f"== {name}: bytes={by/1e6:.0f} MB  flops={fl/1e9:.1f} G  "
          f"(compile {time.time()-t0:.0f}s)", flush=True)
    # rank ops by bytes accessed from the per-op keys if present
    txt = comp.as_text()
    import re
    fus = []
    for m in re.finditer(r"fusion[.\d]*\s*=\s*\S+\s+fusion\(", txt):
        pass
    # count op kinds in the optimized HLO
    kinds = {}
    for m in re.finditer(r"=\s+\S+\s+(\w[\w-]*)\(", txt):
        k = m.group(1)
        kinds[k] = kinds.get(k, 0) + 1
    top = sorted(kinds.items(), key=lambda kv: -kv[1])[:12]
    print("   ops:", dict(top), flush=True)
    return txt

def fused(v, st):
    return lz.fir_filter(v, taps, method="ols", nfft=4096, spectral="fused",
                         zi=st, return_zf=True)

def ffte(v, st):
    return lz.fir_filter(v, taps, method="ols", nfft=4096, spectral="fft",
                         zi=st, return_zf=True)

h = fir_state_len(1024, 4096)
st = jax.ShapeDtypeStruct((C, h), jnp.float32)
txt_fused = report("fused", fused, x, st)
txt_fft = report("fft", ffte, x, st)
with open("/tmp/hlo_fused.txt", "w") as f:
    f.write(txt_fused)
with open("/tmp/hlo_fft.txt", "w") as f:
    f.write(txt_fft)
print("HLO dumped to /tmp/hlo_fused.txt /tmp/hlo_fft.txt")
