"""Driver-hook coverage: entry() compiles and dryrun_multichip executes a
sharded training step on the virtual mesh (the exact calls the round driver
makes)."""

import numpy as np


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 10)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on sharding/compile failure


def test_dryrun_multichip_odd_count():
    """Non-even device counts fall back to expert=1."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(3)
