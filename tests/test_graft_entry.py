"""The driver-facing entry points (__graft_entry__.py) must stay green:
entry() is compile-checked single-chip, dryrun_multichip() produces the
MULTICHIP artifact (failed in round 1 because it never provisioned the
virtual device mesh — VERDICT.md Missing #1)."""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


def test_entry_compiles_and_is_finite():
    fn, args = __graft_entry__.entry()
    logp, grad = jax.jit(fn)(*args)
    assert jnp.isfinite(logp)
    assert jnp.all(jnp.isfinite(grad))


def test_dryrun_multichip_8_devices():
    # conftest already provisions the 8-device virtual CPU platform; the
    # dryrun's own provisioning must be a no-op here and the run must pass
    # its internal sharded==unsharded equality assertion.
    __graft_entry__.dryrun_multichip(8)
