"""Test fixture: 8 virtual CPU devices, no TPU claim.

All unit/parallel tests run on a simulated 8-device CPU mesh
(SURVEY.md §4.4) — this box has exactly one real TPU chip behind a
tunnel, and claiming it per test process is slow and exclusive.  The
environment's sitecustomize force-registers the axon TPU platform and
overwrites ``jax_platforms``; we must (a) request 8 host devices before
backends initialise and (b) re-pin the platform to cpu after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The parallel tests are dominated by shard_map compiles (~10-40 s each on
# an 8-device CPU mesh); persist them so repeated suite runs are cache hits.
jax.config.update("jax_compilation_cache_dir", "/tmp/llzlab_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def snr_db(ref, y) -> float:
    """Signal-to-error ratio in dB (the SURVEY.md §4 acceptance metric)."""
    ref = np.asarray(ref, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    err = ref - y
    perr = float(np.sum(np.abs(err) ** 2))
    psig = float(np.sum(np.abs(ref) ** 2))
    if perr == 0.0:
        return float("inf")
    return 10.0 * np.log10(psig / perr)


@pytest.fixture(scope="session")
def snr():
    return snr_db
