"""Driver contract: entry() compiles; dryrun_multichip runs on 8 CPU devices."""

import jax
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    dist, idx = jax.jit(fn)(*args)
    assert dist.shape[-1] == 10


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
