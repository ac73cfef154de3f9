"""The driver contract: entry() compiles single-chip; dryrun_multichip(8)
jits the full sharded train step on the faked 8-device mesh.
"""

import jax
import pytest


def test_dryrun_multichip_8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, (params, batch) = ge.entry()
    lowered = jax.jit(fn).lower(params, batch)
    compiled = lowered.compile()
    assert compiled is not None
