"""TPU tier fixture: claim the real chip (overrides the root conftest's
CPU pin).  Run with `python -m pytest tests/tpu -m tpu` — ALONE: the
chip is exclusive, and the axon tunnel pays a one-time ~400 s stall on
the first device→host transfer of the process.
"""

import jax
import pytest


@pytest.fixture(scope="session", autouse=True)
def tpu_backend():
    # The root tests/conftest.py pins jax_platforms=cpu at import; flip
    # it back before the first backend initialisation in this session.
    jax.config.update("jax_platforms", "axon,cpu")
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend available", allow_module_level=False)
    return jax.devices()[0]
