"""Driver-contract regression tests for __graft_entry__.

Round 1 shipped with a red MULTICHIP artifact because dryrun_multichip
assumed n devices already existed. These tests pin the contract: the inline
path on a big-enough mesh, the self-provisioning re-exec path when the mesh
is too small, and that entry() still lowers under jit.
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_lowers_under_jit():
    fn, args = graft.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None


def test_dryrun_inline_path():
    # Test env has 8 virtual CPU devices, so this runs inline.
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_self_provisions_when_short_on_devices():
    # 16 > the 8 visible devices: must re-exec a 16-device CPU child and pass.
    graft.dryrun_multichip(16)
