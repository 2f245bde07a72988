"""Multi-host (DCN) code-path structure test.

Runs scripts/distributed_smoke.py: two OS processes x 4 virtual CPU devices,
``jax.distributed.initialize`` on localhost, a (2, 4) mesh whose 'ty' axis
crosses the process boundary, one sharded inverse-render step — asserting the
cross-process gradient psum reproduces the single-process step exactly
(through the adam update). The structural stand-in for a 2-host pod slice
(BASELINE north-star scaling row); real pods are not available in CI.
"""
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_two_process_distributed_step_matches_single_process():
    env = dict(os.environ)
    # the workers force the CPU backend themselves; a clean env var helps the
    # subprocesses skip the remote-TPU platform plugin entirely
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "distributed_smoke.py")],
        env=env, capture_output=True, text=True, timeout=570)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "DISTRIBUTED_SMOKE_OK" in out.stdout
