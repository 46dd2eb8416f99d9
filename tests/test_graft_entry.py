"""The driver entry points must stay importable and runnable."""

import importlib.util
import sys

import jax
import numpy as np


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    mod = _load_entry()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == args[3].shape
    assert bool(np.isfinite(np.asarray(out)).all())


def test_dryrun_multichip_8():
    mod = _load_entry()
    mod.dryrun_multichip(8)


def test_dryrun_multichip_1():
    mod = _load_entry()
    mod.dryrun_multichip(1)
