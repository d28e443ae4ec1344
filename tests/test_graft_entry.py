"""The driver's entry points must stay importable and runnable."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.slow  # the driver runs entry() directly every round
def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow  # the driver runs dryrun_multichip directly every round
def test_dryrun_multichip_8(devices8):
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
