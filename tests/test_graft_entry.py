"""Driver contract: __graft_entry__ must expose entry() and a working
multi-chip dry run on the virtual CPU mesh."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.heavy  # full sharded train step on 8 virtual devices (~19s);
# the driver executes dryrun_multichip separately every round anyway
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.heavy  # oracle/e2e composition: full gate only (quick-loop rebalance, round 11)
def test_entry_shapes():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    # trace-only check on CPU (full 518px forward executes in bench/driver)
    shape = jax.eval_shape(fn, *args)
    assert shape.shape == (1, 37, 37)
