"""Regression tests for the driver entry points in __graft_entry__.py.

Round-1 failure mode (MULTICHIP_r01.json rc=1): dryrun_multichip asserted
on the device count instead of self-provisioning a virtual CPU mesh. These
tests pin both paths:
  - in-process fast path (enough devices already, as under tests/conftest.py)
  - subprocess re-exec path (driver-like 1-device parent)
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # ~155 s: fresh-process re-exec compiles everything cold
def test_dryrun_multichip_subprocess_reexec_like_driver():
    """Simulate the driver: a parent process with ONE device calls
    dryrun_multichip(8); it must self-provision a virtual CPU mesh."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Strip the 8-device flag conftest sets, so the parent has 1 device.
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "assert jax.device_count() == 1, jax.device_count(); "
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "one DP train step OK" in proc.stdout
    assert "sharded synth OK" in proc.stdout


@pytest.mark.slow  # ~45 s: jits the full DP train step + sharded serving
def test_dryrun_multichip_inprocess_fast_path():
    """Under the 8-virtual-device test env the dry run stays in-process."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
