"""Driver interface regressions: entry() must trace+run and
dryrun_multichip must execute real sharded steps on the fake mesh."""

import sys
import os

import numpy as np
import jax


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


def test_entry_traces_and_runs():
    fn, args = graft.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    state, fields = out
    assert fields.height.shape == (1024, 1024)
    assert np.isfinite(np.asarray(fields.height[:8, :8])).all()
