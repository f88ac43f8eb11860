#!/usr/bin/env python3
"""Run the reference library's OWN test suite against this engine.

The compat shim (compat/matrixprofile/) presents matrixprofile_1_ray under
the reference's package name; pre-importing it here means the reference
repo's (un-importable: Cython modules never built in this runtime, no
generated version.py) own package can never shadow it during collection.

Excluded by runtime necessity, not by engine gaps:
  test_datasets.py   -- downloads datasets over the network (none here)
  test_visualize.py  -- imports matplotlib (not installed here)

Usage: python3 tools/run_reference_tests.py [REFERENCE_TESTS_DIR]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_TESTS = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests"

sys.path.insert(0, os.path.join(REPO, "compat"))
sys.path.insert(0, REPO)
sys.dont_write_bytecode = True  # the reference tree is read-only

import matrixprofile  # noqa: E402  (the shim -- must win before collection)
import matrixprofile_1_ray  # noqa: E402

assert matrixprofile.core is matrixprofile_1_ray.core, "shim did not bind"

import pytest  # noqa: E402

sys.exit(pytest.main([
    REF_TESTS, "-q", "-p", "no:cacheprovider",
    f"--ignore={REF_TESTS}/test_datasets.py",
    f"--ignore={REF_TESTS}/test_visualize.py",
]))
