"""Smoke-run the example applications (tiny sizes): they are the
framework's end-to-end app-level checks (the reference paper's
motivating workloads) and must keep passing their own built-in
verifications."""

import os
import runpy
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, argv):
    old_argv, old_cwd = sys.argv, os.getcwd()
    sys.argv = [script] + argv
    os.chdir(REPO)
    try:
        runpy.run_path(os.path.join(REPO, "examples", script),
                       run_name="__main__")
    finally:
        sys.argv, _ = old_argv, os.chdir(old_cwd)


@pytest.mark.parametrize("script,argv", [
    ("amg_galerkin.py", ["32", "2"]),
    ("serving_loop.py", ["512", "1"]),
    ("triangle_counting.py", []),
])
def test_example_smoke(script, argv):
    _run(script, argv)  # each example raises/exits nonzero on MISMATCH
