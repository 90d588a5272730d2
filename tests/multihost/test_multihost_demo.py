"""Multi-host (fake-DCN) process-boundary + restart regression tests
(VERDICT r1 item 9; SURVEY.md §4.5).

Runs scripts/multihost_fir_demo.py as subprocesses: N local processes
with forced CPU device counts form one global mesh over
jax.distributed — exercising process boundaries, the sharded FIR chain,
checkpointing, and kill/restart recovery.  Marked slow+multihost; run
with `pytest -m multihost`.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SCRIPT = os.path.join(REPO, "scripts", "multihost_fir_demo.py")


def _run(tmp_path, *extra):
    env = dict(os.environ)
    env.pop("JAX_PROCESS_ID", None)
    # The orchestrator's workers pin CPU themselves; keep the parent light.
    cmd = [sys.executable, SCRIPT, "--procs", "2", "--devices-per-proc", "4",
           "--workdir", str(tmp_path), *extra]
    return subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=900)


@pytest.mark.multihost
@pytest.mark.slow
class TestMultihostDemo:
    def test_two_process_mesh_matches_golden(self, tmp_path):
        r = _run(tmp_path / "clean")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "multihost == streaming-golden: True" in r.stdout + r.stderr
        # r5: the config-4 spectral chain's lookahead/OLA ppermutes
        # crossed the fake DCN and matched the unsharded chain
        assert "spectral sharded == unsharded: True" in (
            r.stdout + r.stderr)

    def test_fault_injection_restart(self, tmp_path):
        r = _run(tmp_path / "fault", "--inject-fault", "1")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "fault observed" in r.stdout + r.stderr
        assert "multihost == streaming-golden: True" in r.stdout + r.stderr
