"""Regression guard for the multi-host (DCN) path.

Runs tools/dryrun_multihost.py as a subprocess: 2 processes x 4 virtual
CPU devices join one jax.distributed world, shard a global batch from
per-process slices, and run one data-parallel train step whose psum spans
both processes (the cross-host collective a TPU pod runs over DCN).
VERDICT r2 missing #6: without this, the DCN path can silently rot.
"""
from __future__ import annotations

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_dcn_dryrun():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # a parent pytest session may pin single-process CPU settings; the
    # dryrun manages its own platform/device-count env per worker
    env.pop("PPSURF_MH_RANK", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=900, env=env,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "multihost dryrun: OK" in out, out[-4000:]
    assert out.count("multihost step ok") == 2, out[-4000:]
