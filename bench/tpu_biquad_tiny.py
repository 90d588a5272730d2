import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
import llzlab_tpu as lz
from llzlab_tpu.kernels.biquad_scan import sosfilt_pallas

rng = np.random.default_rng(0)
sos2 = lz.peaking_eq_sos([400, 2000], [4, -3], 48000, q=1.0)
x = rng.standard_normal((8, 4096)).astype(np.float32)
t0 = time.perf_counter()
y, zf = sosfilt_pallas(sos2, jnp.asarray(x), block_size=1024)
y.block_until_ready()
print("2-section L=1024 compile+run:", time.perf_counter()-t0, "s", flush=True)
import scipy.signal as ss
ref = ss.sosfilt(sos2, x.astype(np.float64), axis=-1)
e = ref - np.asarray(y, np.float64)
print("snr:", 10*np.log10((ref**2).sum()/(e**2).sum()), flush=True)
