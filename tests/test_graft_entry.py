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


def test_dryrun_multichip_8_within_budget(devices8):
    """The driver's multi-chip gate, IN THE DEFAULT LANE with a hard wall
    budget (VERDICT round-3 'next' #1d): the round-3 regression — a gate
    redesign whose cold compile blew past the driver window — must be
    catchable before the driver runs it. Budget = 900 s: measured 241 s
    cold solo (r4), 609 s cold while an eval pipeline + full lane shared
    the single host core (r5) — the alarm is for structural blowups, not
    scheduler contention; the per-phase timestamps the gate prints
    attribute any future overrun."""
    import time

    from __graft_entry__ import dryrun_multichip

    t0 = time.time()
    dryrun_multichip(8)
    elapsed = time.time() - t0
    assert elapsed < 900, (
        f"dryrun_multichip(8) took {elapsed:.0f}s — over the driver-window "
        f"budget; check the per-phase [dryrun +..s] timestamps above"
    )
