"""Keep the driver entry points green: entry() compiles, dryrun_multichip runs."""

import importlib.util
import os

import jax
import pytest


@pytest.fixture(scope="module")
def graft():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("__graft_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_forward_compiles(graft):
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert len(out) == 3  # selective flagship: (output, select, aux)
    assert out[0].shape == (2, 64, 64)


def test_dryrun_multichip_8(graft):
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2(graft):
    graft.dryrun_multichip(2)
