"""CLI tool frontends mirroring the reference's per-tool binaries (T5)."""
