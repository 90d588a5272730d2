"""Runtime bootstrap: platform, mesh, distributed init (SURVEY.md layer T0)."""

from llzlab_tpu.runtime.platform import force_cpu, on_tpu, cpu_mesh_devices  # noqa: F401
