"""Pin the driver contract: __graft_entry__ must keep working as called.

The round-1 driver failure was a make_mesh assert inside
dryrun_multichip — exactly the class of regression these tests catch
before the driver does. dryrun_multichip(8) runs in-process here because
conftest.py already provides the 8-device CPU platform the driver
simulates.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


def test_make_mesh_arg_handling():
    """The exact r01 failure shape: explicit (n_data, n_model) splits."""
    import jax
    from horizonnet_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(n_data=8)
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh = make_mesh(n_data=2, n_model=2,
                     devices=jax.devices()[:4])
    assert dict(mesh.shape) == {"data": 2, "model": 2}
    with pytest.raises(AssertionError):
        make_mesh(n_data=8, n_model=2)  # 16 > 8 devices


@pytest.mark.heavy
def test_entry_forward_compiles():
    import jax

    fn, (variables, x) = __graft_entry__.entry()
    bon, cor = jax.eval_shape(fn, variables, x)
    assert bon.shape == (1, 2, 1024)
    assert cor.shape == (1, 1, 1024)


@pytest.mark.slow
def test_dryrun_multichip_8():
    """Run the driver's multichip gate exactly as the driver does.

    conftest provides 8 CPU devices, so this takes the in-process path
    (no subprocess spawn) — dp x tp (4, 2) step on tiny shapes.
    """
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.heavy
def test_dryrun_impl_pure_dp_tiny():
    """Fast in-suite smoke of the SPMD step on a (2, 1) mesh.

    _dryrun_impl asserts loss finiteness and the optimizer step count
    itself; reaching the return is the pass condition.
    """
    __graft_entry__._dryrun_impl(2, 1)
