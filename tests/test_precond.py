"""Gauss-Newton preconditioner: Jacobian oracle, precision assembly, and
posterior invariance under the whitening map."""

import jax
import jax.numpy as jnp
import numpy as np

from magi_v2_tpu import preprocess
from magi_v2_tpu.models import seir_f_vec
from magi_v2_tpu.posterior import make_log_posterior, make_posterior_data
from magi_v2_tpu.sampler.precond import (
    factor_precision,
    gauss_newton_precision,
    make_tempered_logp_grad_gn,
    pointwise_ode_jacobian,
    unwhiten_Z_full,
    whiten_X_full,
)
from magi_v2_tpu.sampler.magi_state import flatten_state


def test_pointwise_jacobian_matches_fd():
    rng = np.random.default_rng(0)
    N = 7
    I = np.linspace(0, 1, N)
    X = rng.normal(size=(N, 3)) * 0.1 + 0.2
    th = jnp.asarray([6.0, 0.6, 1.8])
    J = np.asarray(pointwise_ode_jacobian(seir_f_vec, I, X, th))
    assert J.shape == (N, 3, 3)
    h = 1e-6
    for e in range(3):
        dX = np.zeros_like(X)
        dX[:, e] = h
        fp = np.asarray(seir_f_vec(jnp.asarray(I[:, None]), jnp.asarray(X + dX), th))
        fm = np.asarray(seir_f_vec(jnp.asarray(I[:, None]), jnp.asarray(X - dX), th))
        np.testing.assert_allclose(J[:, :, e], (fp - fm) / (2 * h), atol=1e-6)


def _fixture(seed=0, N=9, D=3):
    rng = np.random.default_rng(seed)
    I = np.linspace(0, 1, N).reshape(-1, 1)
    X_obs = rng.normal(size=(N, D)) * 0.1 + 0.2
    X_obs[rng.random(X_obs.shape) < 0.25] = np.nan
    obs = preprocess.build_observation_index(X_obs)

    def spd():
        a = rng.normal(size=(N, N))
        return a @ a.T / N + np.eye(N)

    C_invs = np.stack([spd() for _ in range(D)])
    K_invs = np.stack([spd() for _ in range(D)])
    m_ds = np.stack([rng.normal(size=(N, N)) * 0.3 for _ in range(D)])
    mu = rng.normal(size=D) * 0.1
    beta = 1.7
    sigma_LB = np.full(D, 1e-4)
    data = make_posterior_data(
        I, C_invs, m_ds, K_invs, mu, beta, obs, sigma_LB, jnp.float64
    )
    return data, C_invs, m_ds, K_invs, mu, beta, obs, I, X_obs


def test_gn_precision_matches_bruteforce_hessian_of_quadratic():
    """With f frozen at its linearization, the GN precision equals the exact
    Hessian of -(t1+t2)/beta - t4 in X."""
    data, C_invs, m_ds, K_invs, mu, beta, obs, I, X_obs = _fixture()
    N, D = X_obs.shape
    rng = np.random.default_rng(1)
    Xhat = rng.normal(size=(N, D)) * 0.1 + 0.2
    th = np.asarray([6.0, 0.6, 1.8])
    sigma = np.full(D, 0.01)

    J = pointwise_ode_jacobian(seir_f_vec, I, Xhat, jnp.asarray(th))
    obs_mask = (~np.isnan(X_obs)).astype(np.float64)
    lam = np.asarray(gauss_newton_precision(
        C_invs, m_ds, K_invs, beta, obs_mask, sigma, J
    ))

    # brute force: Hessian of the quadratic functional with f linearized
    def quad(xf):
        X = xf.reshape(N, D)
        Xc = (X - mu[None, :]).T
        t1 = sum(Xc[d] @ C_invs[d] @ Xc[d] for d in range(D))
        f0 = np.asarray(seir_f_vec(jnp.asarray(I), jnp.asarray(Xhat), jnp.asarray(th)))
        Jn = np.asarray(J)
        f_lin = f0 + np.einsum("nde,ne->nd", Jn, X - Xhat)
        t2 = 0.0
        for d in range(D):
            r = f_lin[:, d] - m_ds[d] @ Xc[d]
            t2 += r @ K_invs[d] @ r
        t4 = np.nansum((X - np.nan_to_num(X_obs)) ** 2 * obs_mask / sigma)
        return ((t1 + t2) / beta + t4) / 2.0

    xf0 = Xhat.ravel()
    h = 1e-5
    H = np.zeros((N * D, N * D))
    for i in range(N * D):
        ei = np.zeros(N * D); ei[i] = h
        for j in range(i, N * D):
            ej = np.zeros(N * D); ej[j] = h
            H[i, j] = H[j, i] = (
                quad(xf0 + ei + ej) - quad(xf0 + ei) - quad(xf0 + ej) + quad(xf0)
            ) / h ** 2
    np.testing.assert_allclose(lam, H, rtol=2e-3, atol=2e-3)


def test_posterior_invariant_under_gn_whitening():
    data, C_invs, m_ds, K_invs, mu, beta, obs, I, X_obs = _fixture(2)
    N, D = X_obs.shape
    rng = np.random.default_rng(3)
    Xhat = rng.normal(size=(N, D)) * 0.1 + 0.2
    th0 = jnp.asarray([6.0, 0.6, 1.8])
    J = pointwise_ode_jacobian(seir_f_vec, I, Xhat, th0)
    obs_mask = (~np.isnan(X_obs)).astype(np.float64)
    lam = gauss_newton_precision(
        C_invs, m_ds, K_invs, beta, obs_mask, np.full(D, 0.01), J
    )
    L, L_inv = factor_precision(lam)
    Cb = np.zeros((N, D, N, D))
    for d in range(D):
        Cb[:, d, :, d] = C_invs[d]
    A1 = jnp.asarray(L).T @ (jnp.asarray(Cb.reshape(N * D, N * D)) @ jnp.asarray(L))

    lp_centered = make_log_posterior(data, seir_f_vec)
    lp_gn = make_tempered_logp_grad_gn(data, seir_f_vec, L, A1, N, D, 3)

    for _ in range(3):
        X = jnp.asarray(rng.normal(size=(N, D)) * 0.2)
        Z = whiten_X_full(X, data.mu_ds, L_inv)
        # roundtrip
        np.testing.assert_allclose(
            np.asarray(unwhiten_Z_full(Z, data.mu_ds, L)), np.asarray(X),
            atol=1e-9,
        )
        s = jnp.asarray(rng.normal(size=D))
        t = jnp.asarray(rng.normal(size=3))
        q = flatten_state(Z, s, t)
        v_gn, _ = lp_gn(q, 0.8)
        v_c = lp_centered(X, s, t, 0.8)
        np.testing.assert_allclose(float(v_gn), float(v_c), rtol=1e-9)
