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
