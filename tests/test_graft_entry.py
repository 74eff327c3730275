"""The driver's contract: entry() compiles and runs; dryrun_multichip
executes real DP x TP sharded train steps on the virtual device mesh."""

import numpy as np
import jax
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    # random init: CE ~= ln(vocab) = ln(8192)
    assert abs(float(loss) - np.log(8192)) < 0.5


def test_dryrun_multichip_eight_virtual_devices(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out
    assert "mesh=(4, 2)" in out


def test_dryrun_multichip_single_device():
    import __graft_entry__ as g

    g.dryrun_multichip(1)  # pure-DP degenerate mesh must also work
