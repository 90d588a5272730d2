"""Pallas TPU kernels (SURVEY.md layer T1).

Each kernel has a jnp reference path in ``llzlab_tpu.ops``; kernels are
opt-in fast paths validated against those references in tests/kernels/.
"""
