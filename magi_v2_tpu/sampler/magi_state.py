"""Flat-vector packing of the MAGI sampler state.

The NUTS core (sampler/nuts.py) works on a flat position vector; the MAGI
state is (X (N_I, D), sigma_sqs_pre (D,), thetas_pre (D_thetas,)), packed in
that order — the same three blocks as the reference's initial_state list
(magi_v2.py:383)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from magi_v2_tpu.posterior import PosteriorData, log_posterior


def flatten_state(X, sigma_sqs_pre, thetas_pre):
    return jnp.concatenate([X.reshape(-1), sigma_sqs_pre, thetas_pre])


def unflatten_state(q, N_I: int, D: int, D_thetas: int):
    X = q[: N_I * D].reshape(N_I, D)
    sigma_sqs_pre = q[N_I * D : N_I * D + D]
    thetas_pre = q[N_I * D + D :]
    return X, sigma_sqs_pre, thetas_pre


def unflatten_samples(samples, N_I: int, D: int, D_thetas: int):
    """(T, C, dim) -> (X (T,C,N_I,D), sigma_pre (T,C,D), theta_pre (T,C,Dθ))."""
    T, C = samples.shape[:2]
    X = samples[..., : N_I * D].reshape(T, C, N_I, D)
    sigma = samples[..., N_I * D : N_I * D + D]
    theta = samples[..., N_I * D + D :]
    return X, sigma, theta


def make_tempered_logp_grad(
    data: PosteriorData, f_vec: Callable, N_I: int, D: int, D_thetas: int
):
    """(q, beta_temp) -> (logp, dlogp/dq), the fused evaluation NUTS calls."""

    def lp(q, beta_temp):
        X, sigma_pre, theta_pre = unflatten_state(q, N_I, D, D_thetas)
        return log_posterior(data, f_vec, X, sigma_pre, theta_pre, beta_temp)

    vag = jax.value_and_grad(lp, argnums=0)

    def logp_grad(q, beta_temp):
        return vag(q, beta_temp)

    return logp_grad


# ---------------------------------------------------------------------------
# Whitened (non-centered) parameterization
# ---------------------------------------------------------------------------
#
# The centered X-space posterior is brutally stiff: the GP prior quadratic
# x' C^{-1} x has curvature up to the largest eigenvalue of C^{-1} (measured
# ~1e8 on the SEIR vignette matrices), which a diagonal mass matrix cannot
# fix because the stiff directions are not axis-aligned — NUTS step sizes
# collapse to ~1e-2 and theta ESS to ~10. Sampling z with X = mu + L z,
# where L = C^{1/2} (symmetric eigh sqrt), turns the prior term into
# ||z||^2 / beta — unit curvature — while the likelihood/manifold terms stay
# gentle. The map is linear, so the posterior over X is IDENTICAL (constant
# Jacobian); this is purely a sampler coordinate change (the standard
# non-centered trick for latent-GP models).


def gp_sqrt_factors(C_invs):
    """Per-component (L, L_inv) with L = C^{1/2} from eigh of C^{-1}.

    C = pinv(C_inv); eigenvalues of C_inv below the pinv cutoff map to 0 in
    L (those directions carry no prior mass and stay frozen at mu).
    """
    C_invs = jnp.asarray(C_invs)
    w, V = jnp.linalg.eigh((C_invs + jnp.swapaxes(C_invs, -1, -2)) / 2.0)
    n = C_invs.shape[-1]
    cutoff = n * jnp.finfo(C_invs.dtype).eps * jnp.max(
        jnp.abs(w), axis=-1, keepdims=True
    )
    ok = w > cutoff
    inv_sqrt_w = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, w, 1.0)), 0.0)
    sqrt_w = jnp.where(ok, jnp.sqrt(jnp.where(ok, w, 1.0)), 0.0)
    L = (V * inv_sqrt_w[..., None, :]) @ jnp.swapaxes(V, -1, -2)
    L_inv = (V * sqrt_w[..., None, :]) @ jnp.swapaxes(V, -1, -2)
    return L, L_inv


def whiten_X(X, mu_ds, L_inv):
    """z (N, D) from X (N, D): z_d = L_inv_d (x_d - mu_d)."""
    return jnp.einsum("dnm,dm->dn", L_inv, (X - mu_ds[None, :]).T).T


def unwhiten_Z(Z, mu_ds, L):
    """X (..., N, D) from z (..., N, D): x_d = mu_d + L_d z_d."""
    Xc = jnp.einsum("dnm,...md->...nd", L, Z)
    return Xc + mu_ds


def make_tempered_logp_grad_whitened(
    data: PosteriorData,
    f_vec: Callable,
    L,                      # (D, N_I, N_I) GP sqrt factors
    N_I: int,
    D: int,
    D_thetas: int,
):
    """Whitened-state fused evaluation: q = (z flat, sigma_pre, theta_pre).

    t1 is computed natively as ||z||^2: with L = C^{1/2} from the shared
    eigh, z' L' C^{-1} L z = z' P z (P the projector onto the retained
    spectrum). Using the full ||z||^2 instead of z'Pz adds a proper N(0,1)
    prior on the discarded-eigenvalue coordinates — which do not affect X
    at all (L maps them to zero) — so the posterior over X is unchanged
    while the float32 cancellation of the raw x'C^{-1}x form (1e8-magnitude
    terms) is avoided entirely.
    """
    from magi_v2_tpu.posterior import log_posterior_given_t1

    def lp(q, beta_temp):
        Z, sigma_pre, theta_pre = unflatten_state(q, N_I, D, D_thetas)
        X = unwhiten_Z(Z, data.mu_ds, L)
        t1 = jnp.sum(Z * Z)
        return log_posterior_given_t1(
            data, f_vec, X, sigma_pre, theta_pre, beta_temp, t1
        )

    vag = jax.value_and_grad(lp, argnums=0)

    def logp_grad(q, beta_temp):
        return vag(q, beta_temp)

    return logp_grad
