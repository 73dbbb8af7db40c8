"""Gauss-Newton posterior preconditioning for the MAGI sampler.

Measurement-driven design (SEIR vignette, N_I=161):

- centered X-space: curvature ~1e8, NUTS eps ~9e-3, theta ESS ~8
- prior whitening (z = C^{-1/2} x): ESS 45 but trees max out at depth 10 —
  the manifold operator m C^{1/2} is still stiff
- per-component posterior whitening: eps 2.2e-2, ESS ~11 — the remaining
  stiffness is the ODE Jacobian coupling J_f' K^{-1} J_f, which is
  CROSS-component (f_d depends on all components pointwise in time), so no
  per-component factor can capture it.

This module builds the full Gauss-Newton precision of the X block at the
initialization point:

    Lambda = [ blkdiag_d(C_d^{-1}) + (d r/d X)' blkdiag_d(K_d^{-1}) (d r/d X) ] / beta
             + diag(observed)/sigma^2

    r_d(n) = f_d(t_n, X_n, theta) - m_d (x_d - mu_d),
    d r_d(n) / d X[m, e] = delta_{nm} J_d,e(t_n) - m_d[n, m] delta_{e,d}

with J the pointwise ODE Jacobian at (Xhat_init, thetas_init). Sampling
z = L^{-1}(x - mu) with L = Lambda^{-1/2} makes the entire quadratic
structure of the posterior ~unit curvature; only the deviation of f from
its linearization remains. The map is linear and fixed, so the posterior
over X is IDENTICAL. Cost: one (N*D)^2 assembly + one (N*D) eigh at setup.

Scaling note: L = Lambda^{-1/2} is stored dense (ND x ND), so each leapfrog
pays an O((ND)^2) matvec — fine through N_I ~ 1k (38 MB f32 at N_I=1025,
D=3) but dominant beyond. Lambda itself is block-banded (bandwidth ~ the
kernel bandsize), so a banded Cholesky factor with banded triangular solves
would cut this to O(ND * b); future work — at large N_I use
reparam='centered' with storage='banded' instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pointwise_ode_jacobian(f_vec, I, Xhat, thetas):
    """J[n, d, e] = d f_d(t_n, x_n) / d x_e — (N, D, D), at fixed theta."""
    I = jnp.asarray(I).reshape(-1, 1)
    Xhat = jnp.asarray(Xhat)
    thetas = jnp.asarray(thetas)

    def row(t_n, x_n):
        return jax.jacfwd(
            lambda x: f_vec(t_n[None, :], x[None, :], thetas)[0]
        )(x_n)

    return jax.vmap(row)(I, Xhat)  # (N, D, D)


def gauss_newton_precision(
    C_invs, m_ds, K_invs, beta, obs_mask, sigma_sqs, J
):
    """Assemble the (N*D, N*D) Gauss-Newton precision of the X block.

    obs_mask: (N, D) 1.0 where observed; sigma_sqs: (D,); J: (N, D, D).
    Index order matches X.ravel() (row-major: flat = n*D + d).
    """
    C_invs = jnp.asarray(C_invs)
    m_ds = jnp.asarray(m_ds)
    K_invs = jnp.asarray(K_invs)
    J = jnp.asarray(J)
    D, N = C_invs.shape[0], C_invs.shape[1]

    lam = jnp.zeros((N, D, N, D), C_invs.dtype)
    for d in range(D):
        Kd, Ad = K_invs[d], m_ds[d]
        Bd = J[:, d, :]                      # (N, D): d f_d / d x_e
        KA = Kd @ Ad
        AKA = Ad.T @ KA
        lam = lam + jnp.einsum("me,mM,Mf->meMf", Bd, Kd, Bd)
        lam = lam.at[:, :, :, d].add(-jnp.einsum("me,mM->meM", Bd, KA))
        lam = lam.at[:, d, :, :].add(-jnp.einsum("Mm,Mf->mMf", KA, Bd))
        lam = lam.at[:, d, :, d].add(AKA + C_invs[d])

    lam = lam.reshape(N * D, N * D) / jnp.asarray(beta, lam.dtype)
    obs_diag = (jnp.asarray(obs_mask) / jnp.asarray(sigma_sqs)[None, :]).ravel()
    lam = lam + jnp.diag(obs_diag.astype(lam.dtype))
    return lam


def factor_precision(lam, floor_ratio: float = 1e-12):
    """(L, L_inv) = (Lambda^{-1/2}, Lambda^{1/2}) via symmetric eigh."""
    lam = jnp.asarray(lam)
    w, V = jnp.linalg.eigh((lam + lam.T) / 2.0)
    w = jnp.maximum(w, floor_ratio * jnp.max(w))
    L = (V * (w ** -0.5)[None, :]) @ V.T
    L_inv = (V * (w ** 0.5)[None, :]) @ V.T
    return L, L_inv


def build_gn_whitening(model, sigma_sqs_init=None):
    """(L, L_inv, A1) full-state whitening factors from a fitted MAGI_v2
    model (host-side, float64).

    A1 = L' blkdiag_d(C_d^{-1}) L is the GP-prior quadratic expressed in
    whitened coordinates: t1 = z' A1 z. It is well-conditioned (eigenvalues
    bounded by the preconditioned curvature ratio), so evaluating it in
    float32 is safe — unlike the raw x' C^{-1} x form, whose ~1e8-magnitude
    term cancellation destroys float32 energies (measured: NUTS acceptance
    -> 0 on TPU).
    """
    N, D = model.mag_I, model.D
    obs_mask = (~np.isnan(model.X_obs_discret)).astype(np.float64)
    sigma = (
        model.sigma_sqs_init if sigma_sqs_init is None else sigma_sqs_init
    )
    J = pointwise_ode_jacobian(
        model.f_vec, model.I, model.Xhat_init, model.thetas_init
    )
    lam = gauss_newton_precision(
        model.C_d_invs, model.m_ds, model.K_d_invs, model.beta,
        obs_mask, sigma, J,
    )
    L, L_inv = factor_precision(lam)

    # blkdiag(C_inv) in X.ravel() (n*D+d) index order, then sandwich with L
    C_invs = jnp.asarray(model.C_d_invs)
    Cb = jnp.zeros((N, D, N, D), C_invs.dtype)
    for d in range(D):
        Cb = Cb.at[:, d, :, d].set(C_invs[d])
    Cb = Cb.reshape(N * D, N * D)
    A1 = L.T @ (Cb @ L)
    A1 = (A1 + A1.T) / 2.0
    return L, L_inv, A1


# --- full-state whitening transforms (X block flattened row-major) ---------

def whiten_X_full(X, mu_ds, L_inv):
    """z (N, D) from X (N, D) using the full (ND, ND) factor."""
    xc = (X - mu_ds[None, :]).reshape(-1)
    return (L_inv @ xc).reshape(X.shape)


def unwhiten_Z_full(Z, mu_ds, L):
    """X (..., N, D) from z (..., N, D): x = mu + L z_flat."""
    shape = Z.shape
    zf = Z.reshape(shape[:-2] + (-1,))
    xc = jnp.einsum("ij,...j->...i", L, zf)
    return xc.reshape(shape) + mu_ds


def make_tempered_logp_grad_gn(
    data, f_vec, L, A1, N_I: int, D: int, D_thetas: int
):
    """Fused evaluation in GN-whitened coordinates; t1 = z' A1 z (see
    build_gn_whitening for why this form is float32-safe)."""
    from magi_v2_tpu.posterior import log_posterior_given_t1
    from magi_v2_tpu.sampler.magi_state import unflatten_state

    def lp(q, beta_temp):
        Z, sigma_pre, theta_pre = unflatten_state(q, N_I, D, D_thetas)
        X = unwhiten_Z_full(Z, data.mu_ds, L)
        zf = Z.reshape(-1)
        t1 = zf @ (A1 @ zf)
        return log_posterior_given_t1(
            data, f_vec, X, sigma_pre, theta_pre, beta_temp, t1
        )

    vag = jax.value_and_grad(lp, argnums=0)

    def logp_grad(q, beta_temp):
        return vag(q, beta_temp)

    return logp_grad
