"""ODE model registry: shape contract, jittability, and dynamics sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magi_v2_tpu.models import MODEL_REGISTRY


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_f_vec_contract(name):
    """f_vec(t (N,1), X (N,D), theta (D_theta,)) -> (N,D), jittable,
    vmappable (reference contract magi_v2.py:28)."""
    m = MODEL_REGISTRY[name]
    rng = np.random.default_rng(0)
    N = 11
    t = jnp.asarray(np.linspace(0, 1, N).reshape(-1, 1))
    X = jnp.asarray(rng.uniform(0.1, 1.0, size=(N, m.D)))
    th = jnp.asarray(rng.uniform(0.1, 1.0, size=(m.D_thetas,)))
    out = jax.jit(m.f_vec)(t, X, th)
    assert out.shape == (N, m.D)
    assert np.all(np.isfinite(np.asarray(out)))
    # vmap over a chain axis of X
    Xs = jnp.stack([X, X + 0.01])
    outs = jax.vmap(lambda x: m.f_vec(t, x, th))(Xs)
    assert outs.shape == (2, N, m.D)
    assert len(m.theta_names) == m.D_thetas


def test_seir_conservation():
    """dS+dE+dI+dR = 0 with S implicit: sum of f over components = -dS/dt."""
    from magi_v2_tpu.models import seir_f_vec

    t = jnp.zeros((5, 1))
    X = jnp.asarray(np.random.default_rng(1).uniform(0.05, 0.3, (5, 3)))
    th = jnp.asarray([6.0, 0.6, 1.8])
    f = np.asarray(seir_f_vec(t, X, th))
    S = 1.0 - np.asarray(X).sum(axis=1)
    I = np.asarray(X)[:, 1]
    dS = -6.0 * S * I
    np.testing.assert_allclose(f.sum(axis=1), -dS, rtol=1e-10)


def test_sirw_mass_conservation():
    """SIRW is closed: dS+dI+dR+dW = 0."""
    from magi_v2_tpu.models import sirw_f_vec

    t = jnp.zeros((5, 1))
    X = jnp.asarray(np.random.default_rng(2).uniform(0.05, 0.4, (5, 4)))
    th = jnp.asarray([4.0, 1.0, 0.3, 0.5, 0.2])
    f = np.asarray(sirw_f_vec(t, X, th))
    np.testing.assert_allclose(f.sum(axis=1), 0.0, atol=1e-12)


def test_hes1_log_consistent_with_natural():
    """hes1_log on log-states equals (dX/dt)/X of the natural-scale field."""
    from magi_v2_tpu.models import hes1_f_vec, hes1_log_f_vec

    rng = np.random.default_rng(3)
    t = jnp.zeros((4, 1))
    X = jnp.asarray(rng.uniform(0.5, 5.0, (4, 3)))
    th = jnp.asarray(MODEL_REGISTRY["hes1"].true_thetas)
    nat = np.asarray(hes1_f_vec(t, X, th)) / np.asarray(X)
    logf = np.asarray(hes1_log_f_vec(t, jnp.log(X), th))
    np.testing.assert_allclose(logf, nat, rtol=1e-10)


def test_rk4_simulator_matches_lorenz_known_behavior():
    """Simulated Lorenz stays bounded and visits both wings (sanity)."""
    from magi_v2_tpu.models import lorenz_f_vec
    from magi_v2_tpu.utils.data import simulate_ode

    ts, X_obs, X_true = simulate_ode(
        lorenz_f_vec,
        x0=np.array([-8.0, 7.0, 27.0]),
        thetas=np.array([10.0, 28.0, 8.0 / 3.0]),
        t_max=3.0,
        n_obs=61,
        noise_sd=0.0,
        substeps=100,
    )
    assert np.all(np.abs(X_true) < 60)
    assert X_true[:, 0].min() < -1 and X_true[:, 0].max() > 1


def test_lotka_volterra_equilibrium_and_cycle():
    """f vanishes at the coexistence equilibrium (d/c, a/b); the RK4 orbit
    from elsewhere stays positive and oscillates (closed LV cycles)."""
    from magi_v2_tpu.models import lotka_volterra_f_vec
    from magi_v2_tpu.utils.data import simulate_ode

    th = np.array(MODEL_REGISTRY["lotka_volterra"].true_thetas)
    a, b, c, d = th
    eq = jnp.asarray([[d / c, a / b]])
    f_eq = np.asarray(lotka_volterra_f_vec(jnp.zeros((1, 1)), eq, jnp.asarray(th)))
    np.testing.assert_allclose(f_eq, 0.0, atol=1e-12)

    _, _, X = simulate_ode(
        lotka_volterra_f_vec, x0=np.array([1.0, 1.0]), thetas=th,
        t_max=10.0, n_obs=201, noise_sd=0.0, substeps=100,
    )
    assert np.all(X > 0)
    # both components rise above and fall below their equilibrium values
    assert X[:, 0].min() < d / c < X[:, 0].max()
    assert X[:, 1].min() < a / b < X[:, 1].max()


def test_protein_transduction_conservation():
    """Pathway invariants: total receptor R + S_R + R_pp is conserved
    (dsum/dt = 0); total substrate S + S_d + S_R is consumed exactly at the
    phosphorylation rate k4*S_R (S in complex is spent activating R)."""
    from magi_v2_tpu.models import protein_transduction_f_vec

    rng = np.random.default_rng(7)
    t = jnp.zeros((6, 1))
    X = jnp.asarray(rng.uniform(0.05, 1.0, (6, 5)))
    th = jnp.asarray(MODEL_REGISTRY["protein_transduction"].true_thetas)
    f = np.asarray(protein_transduction_f_vec(t, X, th))
    np.testing.assert_allclose(f[:, [2, 3, 4]].sum(axis=1), 0.0, atol=1e-12)
    k4 = th[3]
    np.testing.assert_allclose(
        f[:, [0, 1, 3]].sum(axis=1), -k4 * np.asarray(X)[:, 3], rtol=1e-10
    )
