"""Driver-contract regression tests for __graft_entry__.py."""

import sys

import jax
import numpy as np


def _load():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    return ge


def test_entry_forward():
    ge = _load()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 40)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_dryrun_multichip():
    ge = _load()
    ge.dryrun_multichip(8)  # asserts internally (step + finite loss)
