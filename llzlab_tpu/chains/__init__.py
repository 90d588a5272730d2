"""Named chain presets — the framework's "model zoo" (BASELINE.json configs)."""
