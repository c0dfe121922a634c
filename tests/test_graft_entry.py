"""Driver-contract tests for __graft_entry__."""

import sys


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    # conftest already forces 8 virtual CPU devices.
    ge.dryrun_multichip(8)


def test_entry_returns_jittable():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    scene, cam = args
    assert scene.capacity == 20_000
    assert cam.shape == (3,)
    # Trace-only check (full interpret-mode execution at this scale is too
    # slow on the 1-core CPU; the driver compile-checks on real hardware).
    import jax

    jax.eval_shape(fn, *args)
