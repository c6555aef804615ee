"""The driver entry hooks must keep compiling: entry() single-chip and
dryrun_multichip() on the virtual 8-device mesh."""

import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally


def test_dryrun_multichip_self_provisions_from_one_device():
    """Driver-environment replica: a CLEAN subprocess (no conftest, no
    XLA_FLAGS device-count override) sees ONE device, so dryrun_multichip
    must respawn itself onto a virtual 8-device CPU platform
    (MULTICHIP_r01 failure mode: mesh assert on 1 axon device)."""
    import os
    import subprocess

    env = {
        k: v for k, v in os.environ.items()
        if "xla_force_host_platform_device_count" not in v or k != "XLA_FLAGS"
    }
    env.pop("XLA_FLAGS", None)
    # Keep the parent off the TPU tunnel: force the 1-device CPU platform.
    # HSIMAE_FORCE_CPU is applied at __graft_entry__ IMPORT time, so the
    # entry module must be imported BEFORE the first jax.devices() call —
    # otherwise the subprocess initializes the axon/TPU backend (and hangs
    # whenever the tunnel is down, a real outage mode).
    env["HSIMAE_FORCE_CPU"] = "1"
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '/root/repo'); "
         "import __graft_entry__ as g; "
         "import jax; assert len(jax.devices()) == 1, jax.devices(); "
         "g.dryrun_multichip(8)"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(8) ok" in out.stdout, out.stdout
