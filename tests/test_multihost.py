"""Two-process multi-host smoke: framework dist init + cross-process psum."""

import pytest
import os
import subprocess
import sys

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dp_training_step():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-1000:]
    assert proc.stdout.count("dp train step OK") == 2
