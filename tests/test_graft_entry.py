"""Regression tests for the driver entry points (__graft_entry__.py).

Round-1 failure mode: dryrun_multichip probed ``jax.devices()`` before forcing
the CPU platform, which initializes the pinned TPU backend and blocks forever
when the tunnel is down (MULTICHIP_r01 rc=124). The dryrun must complete on a
virtual-CPU mesh WITHOUT ever touching the TPU backend, so we run it in a
fresh subprocess with a hard timeout.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_subprocess_no_tpu_touch():
    env = dict(os.environ)
    # Forbid any real-backend fallback: if the dryrun tries to initialize a
    # non-CPU platform the import below would fail or hang past the timeout.
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(8) ok" in r.stdout
