"""Jitted L-BFGS (ops/lbfgs.py): closed-form quadratics, Rosenbrock, and
equivalence with the Adam MLE on the hyperparameter objective.

No reference counterpart (magi_v2.py uses host-side Adam only); the
BASELINE.json north star names "jitted LBFGS on-device" for the
hyperparameter fit — this file certifies that path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magi_v2_tpu.hparams import (
    fit_kernel_hparams,
    fourier_prior,
    make_hparam_objective,
)
from magi_v2_tpu.ops.lbfgs import lbfgs_minimize


def test_quadratic_exact():
    """On 0.5 x'Ax - b'x the minimizer must match the linear solve."""
    rng = np.random.default_rng(0)
    n = 12
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    b = rng.standard_normal(n)
    A_j, b_j = jnp.asarray(A), jnp.asarray(b)

    res = jax.jit(
        lambda x0: lbfgs_minimize(
            lambda x: 0.5 * x @ A_j @ x - b_j @ x, x0, num_iters=100
        )
    )(jnp.zeros(n))
    x_star = np.linalg.solve(A, b)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.params), x_star, atol=1e-7)
    # quadratics need at most ~n updates
    assert int(res.num_iters) <= 40


def test_rosenbrock():
    """Classic nonconvex banana from the standard start (-1.2, 1)."""

    def rosen(p):
        x, y = p[0], p[1]
        return (1.0 - x) ** 2 + 100.0 * (y - x * x) ** 2

    res = lbfgs_minimize(rosen, jnp.array([-1.2, 1.0]), num_iters=200,
                         tol=1e-10)
    np.testing.assert_allclose(np.asarray(res.params), [1.0, 1.0],
                               atol=1e-6)
    assert bool(res.converged)


def test_pytree_params_and_loss_trace():
    """Dict-structured parameters round-trip; the loss trace is
    monotone-nonincreasing after the freeze (frozen tail repeats)."""

    def fun(p):
        return jnp.sum((p["a"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 4)

    x0 = {"a": jnp.zeros(3), "b": jnp.zeros((2, 2))}
    res = lbfgs_minimize(fun, x0, num_iters=150)
    np.testing.assert_allclose(np.asarray(res.params["a"]), 3.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.params["b"]), -1.0, atol=2e-3)
    losses = np.asarray(res.losses)
    assert losses.shape == (150,)
    # Armijo guarantees per-iteration decrease; the frozen tail is constant
    assert np.all(np.diff(losses) <= 1e-12)


def test_line_search_failure_freezes_not_nans():
    """A function whose gradient explodes (|x|^0.5 cusp approached from
    afar) must exit cleanly via the line-search freeze, never NaN."""

    def fun(x):
        return jnp.sum(jnp.sqrt(jnp.abs(x) + 1e-12))

    res = lbfgs_minimize(fun, jnp.array([4.0]), num_iters=60)
    assert np.isfinite(float(res.loss))
    assert np.all(np.isfinite(np.asarray(res.params)))


@pytest.fixture(scope="module")
def gp_data():
    rng = np.random.default_rng(1)
    from magi_v2_tpu.ops.kernels import matern_gram

    I = np.linspace(0.0, 4.0, 81)
    X = np.zeros((len(I), 2))
    for d, (p1, p2, ssq) in enumerate([(1.5, 0.8, 0.01), (0.8, 0.5, 0.02)]):
        K = np.asarray(matern_gram(jnp.asarray(I), p1, p2))
        L = np.linalg.cholesky(K + 1e-10 * np.eye(len(I)))
        X[:, d] = (
            L @ rng.standard_normal(len(I))
            + rng.standard_normal(len(I)) * np.sqrt(ssq)
        )
    return I, X


def test_lbfgs_matches_adam_mle(gp_data):
    """optimizer='lbfgs' reaches an objective value at least as good as
    Adam-1000 (reference parity path) and agrees on the hyperparameters."""
    I, X = gp_data
    adam = fit_kernel_hparams(I, X, optimizer="adam")
    lbfgs = fit_kernel_hparams(I, X, optimizer="lbfgs")

    prior = fourier_prior(X, t_range=float(I[-1] - I[0]))
    neg_map, _ = make_hparam_objective(I, X, prior, nu=2.01)

    def objective(fit):
        from magi_v2_tpu.posterior import softplus_inverse

        return float(neg_map({
            "phi1_pre": softplus_inverse(jnp.asarray(fit["phi1s"])),
            "phi2_pre": softplus_inverse(jnp.asarray(fit["phi2s"])),
            "sigma_sq_pre": softplus_inverse(jnp.asarray(fit["sigma_sqs"])),
        }))

    f_adam, f_lbfgs = objective(adam), objective(lbfgs)
    assert f_lbfgs <= f_adam + 1e-3, (f_lbfgs, f_adam)
    np.testing.assert_allclose(lbfgs["phi1s"], adam["phi1s"], rtol=0.05)
    np.testing.assert_allclose(lbfgs["phi2s"], adam["phi2s"], rtol=0.05)
    np.testing.assert_allclose(
        lbfgs["sigma_sqs"], adam["sigma_sqs"], rtol=0.05, atol=1e-5
    )


def test_initial_fit_with_lbfgs_config():
    """End-to-end: MagiConfig(hparam_optimizer='lbfgs') flows through
    initial_fit and produces a sane theta init on the SEIR vignette."""
    from magi_v2_tpu import MAGI_v2, MagiConfig
    from magi_v2_tpu.models import seir_f_vec
    from magi_v2_tpu.utils.data import simulate_ode

    ts_obs, X_obs, _ = simulate_ode(
        seir_f_vec,
        x0=np.array([0.1, 0.05, 0.0]),
        thetas=np.array([6.0, 0.6, 1.8]),
        t_max=4.0,
        n_obs=41,
        noise_sd=0.005,
    )
    cfg = MagiConfig().replace(hparam_optimizer="lbfgs")
    model = MAGI_v2(D_thetas=3, ts_obs=ts_obs, X_obs=X_obs, bandsize=20,
                    f_vec=seir_f_vec, config=cfg)
    model.initial_fit(discretization=1)
    assert np.all(model.phi1s > 0) and np.all(model.phi2s > 0)
    assert np.all(np.isfinite(model.thetas_init))


def test_unknown_optimizer_raises(gp_data):
    I, X = gp_data
    with pytest.raises(ValueError, match="optimizer"):
        fit_kernel_hparams(I, X, optimizer="sgd")
