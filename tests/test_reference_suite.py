"""The reference library's own test suite, run against this engine through
the compat/matrixprofile import shim (tools/run_reference_tests.py).

This is the north star's "must match the reference's outputs on its own
unit tests" criterion made executable: every reference test file except the
two that need the network (test_datasets) or matplotlib (test_visualize)
passes unmodified.  Runs in a subprocess so the shimmed ``matrixprofile``
module never leaks into this session's import state."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "tools", "run_reference_tests.py")
REF_TESTS = "/root/reference/tests"


@pytest.mark.skipif(not os.path.isdir(REF_TESTS),
                    reason="reference checkout not present")
def test_reference_suite_passes():
    proc = subprocess.run(
        [sys.executable, RUNNER, REF_TESTS],
        capture_output=True, text=True, cwd=REPO, timeout=1200)
    tail = "\n".join(proc.stdout.splitlines()[-15:])
    assert proc.returncode == 0, f"reference suite failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert " passed" in proc.stdout and "failed" not in tail
