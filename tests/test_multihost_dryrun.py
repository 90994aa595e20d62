"""Two-process multihost dryrun (VERDICT r2 item 4): executes the REAL
``jax.distributed.initialize`` path (coordinator on 127.0.0.1, 2 processes,
4 virtual CPU devices each, (dcn, data, model) mesh) and asserts the
sharded train-step loss matches a single-process run.

Slow (~2-4 min on the 1-core host: three fresh jax processes).  Skip with
RTTS_SKIP_MULTIHOST_TEST=1.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).parent.parent


@pytest.mark.skipif(os.environ.get("RTTS_SKIP_MULTIHOST_TEST", "") == "1",
                    reason="RTTS_SKIP_MULTIHOST_TEST=1")
def test_two_process_dryrun_matches_single_process():
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_dryrun.py")],
        env=env, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "multihost_dryrun OK" in proc.stdout, proc.stdout
