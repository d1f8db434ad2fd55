"""The driver contract: entry() compiles single-chip; dryrun_multichip runs
the sharded train step over all 8 virtual CPU devices."""

import jax
import pytest


@pytest.mark.slow
def test_entry_jits():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 5


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
