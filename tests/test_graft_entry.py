"""The driver contract: entry() compiles, dryrun_multichip runs on 8 devices."""
import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    win_pos, h_lo, h_hi, emit = out
    assert np.asarray(emit).any()


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
