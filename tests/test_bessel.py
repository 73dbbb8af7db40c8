"""Bessel K_nu vs the SciPy oracle (values, first/second derivatives, grads).

The reference computes these numbers with scipy.special.kvp on the host
(magi_v2.py:787); our JAX implementation must match to near machine precision
across the z range the Matern kernel actually uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sps

from magi_v2_tpu.ops import bessel

# z grid covering both algorithm regimes (series z<=2, CF2 z>2) and extremes.
Z_GRID = np.concatenate(
    [
        np.geomspace(1e-8, 2.0, 60),
        np.linspace(2.0 + 1e-9, 50.0, 60),
        np.array([1.9999, 2.0, 2.0001, 100.0, 300.0, 650.0]),
    ]
)


@pytest.mark.parametrize("v", [0.01, 0.5, 1.01, 2.01, 3.7, 4.01])
def test_kv_matches_scipy(v):
    ours = np.asarray(bessel.kv(v, jnp.asarray(Z_GRID)))
    ref = sps.kv(v, Z_GRID)
    # 2e-12: the Temme series loses ~3 bits right at the z=2 regime boundary.
    np.testing.assert_allclose(ours, ref, rtol=2e-12, atol=1e-300)


@pytest.mark.parametrize("n", [1, 2])
def test_kvp_matches_scipy(n):
    v = 2.01
    ours = np.asarray(bessel.kvp(v, jnp.asarray(Z_GRID), n=n))
    ref = sps.kvp(v, Z_GRID, n=n)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_autodiff_grad_matches_identity():
    """jax.grad of K_v must equal -(K_{v-1}+K_{v+1})/2 from SciPy."""
    v = 2.01
    z = jnp.asarray(np.geomspace(1e-4, 40.0, 50))
    g = jax.vmap(jax.grad(lambda x: bessel.kv(v, x)))(z)
    ref = sps.kvp(v, np.asarray(z), n=1)
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-11)


def test_autodiff_second_order():
    v = 2.01
    z = jnp.asarray(np.geomspace(1e-3, 30.0, 30))
    g2 = jax.vmap(jax.grad(jax.grad(lambda x: bessel.kv(v, x))))(z)
    ref = sps.kvp(v, np.asarray(z), n=2)
    np.testing.assert_allclose(np.asarray(g2), ref, rtol=1e-10)


def test_underflow_region_is_zero_not_nan():
    out = np.asarray(bessel.kv(2.01, jnp.asarray([800.0, 1e4])))
    assert np.all(out == 0.0)
    g = jax.grad(lambda x: bessel.kv(2.01, x))(jnp.asarray(800.0))
    assert np.isfinite(np.asarray(g))


def test_jit_and_vmap_compose():
    f = jax.jit(lambda z: bessel.kv(2.01, z))
    out = np.asarray(f(jnp.asarray(Z_GRID)))
    np.testing.assert_allclose(out, sps.kv(2.01, Z_GRID), rtol=5e-13)
