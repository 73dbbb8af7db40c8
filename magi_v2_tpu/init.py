"""Initialization of theta (and unobserved trajectories) before sampling.

Two branches, mirroring the reference:

- Fully observed systems (magi_v2.py:133-179): minimize the manifold-
  constraint term t2 w.r.t. theta only, with X fixed at the interpolated
  trajectories; ``m_ds @ X_cent`` precomputed once (magi_v2.py:139-142).
- Partially observed systems (magi_v2.py:182-268): point-estimate
  (X_unobs, theta) jointly by gradient matching — L2 between f(X_full, theta)
  and 2nd-order central finite differences of X_full on the uniform grid
  (magi_v2.py:210-216) — with observed components fixed at their CV-smoothed
  values. Deviations by intent: theta constrained positive via softplus
  (matching the sampler's support; the reference's raw theta admits a
  degenerate sign-flipped basin on Hes1) and multi-start selection by the
  observed-manifold score (see fit_unobserved_gradient_matching).

Both run Adam(lr=0.01) for 10000 steps — inside one lax.scan (the reference
pays 10000 Python->XLA dispatches, magi_v2.py:175-176,244-245).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _adam_scan(loss_fn, params, learning_rate, num_iters):
    opt = optax.adam(learning_rate, eps=1e-7)  # tf_keras Adam epsilon parity

    @jax.jit
    def run(params):
        opt_state = opt.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(step, (params, opt_state), None,
                                           length=num_iters)
        return params, losses

    return run(params)


def fit_theta_fully_observed(
    f_vec: Callable,
    I,
    Xhat_init,
    mu_ds,
    m_ds,
    K_invs,
    D_thetas: int,
    learning_rate: float = 0.01,
    num_iters: int = 10000,
):
    """theta MAP with X fixed (reference theta_objective, magi_v2.py:148-158).

    Minimizes sum_d ||f_d(I, Xhat, theta) - m_d (x_d - mu_d)||^2_{K_d^{-1}}
    starting from theta = ones (magi_v2.py:136).

    Deviation by intent (same rationale as the partially-observed branch):
    theta is optimized through softplus, matching the sampler's theta > 0
    support. The reference's raw-theta objective is unbounded below in
    sign-flipped directions; measured on Lorenz N_I=2049 (disc=3, where
    K^{-1} ~ h^-4 weights the interpolant's high-frequency error 16x
    harder), an x64 Adam trajectory on the raw objective diverges to
    theta = (-3.4, 35.9, -122.0) — a basin the sampler cannot even
    represent.
    """
    I = jnp.asarray(np.asarray(I))
    Xhat = jnp.asarray(np.asarray(Xhat_init))
    dtype = Xhat.dtype
    mu = jnp.asarray(np.asarray(mu_ds), dtype)
    m_ds = jnp.asarray(np.asarray(m_ds), dtype)
    K_invs = jnp.asarray(np.asarray(K_invs), dtype)

    X_cent = (Xhat - mu[None, :]).T                       # (D, N)
    m_prod = jnp.einsum("dnm,dm->dn", m_ds, X_cent)       # precomputed once

    def loss(th_pre):
        f_vals = f_vec(I, Xhat, jax.nn.softplus(th_pre)).T  # (D, N)
        resid = f_vals - m_prod
        return jnp.einsum("dn,dnm,dm->", resid, K_invs, resid)

    # softplus^{-1}(1): starts at theta = ones like the reference
    theta0 = jnp.full((D_thetas,), float(np.log(np.expm1(1.0))), dtype)
    th_pre, losses = _adam_scan(loss, theta0, learning_rate, num_iters)
    return (
        np.asarray(jax.nn.softplus(th_pre)),
        np.asarray(losses),
    )


def fit_unobserved_gradient_matching(
    f_vec: Callable,
    I,
    X_obs_smoothed,       # (N_I, D_observed) CV-smoothed observed components
    proper_order,         # permutation restoring original component order
    D_unobserved: int,
    D_thetas: int,
    seed: int = 0,
    learning_rate: float = 0.01,
    num_iters: int = 10000,
    num_starts: int = 8,
    observed_components=None,  # indices into the full component order
    m_ds_obs=None,             # (D_obs, N, N) conditional-derivative operators
    K_invs_obs=None,           # (D_obs, N, N) derivative precision operators
    mu_obs=None,               # (D_obs,) GP means of the observed comps
):
    """Joint (X_unobs, theta) gradient-matching init (magi_v2.py:199-245).

    X_unobs is initialized from the observed components' moments
    (magi_v2.py:219-226); the loss is the L2 gap between f(X_full, theta) and
    central finite differences of X_full on the uniform grid.

    Extensions over the reference (single random start, raw theta):

    - theta is optimized through softplus, matching the sampler's support.
      The reference's raw-theta objective admits sign-flipped parameters —
      measured on Hes1: every start converges to a degenerate basin where
      a < 0 lets the free latent H act as an arbitrary forcing term for the
      observed P equation, flattening the loss below the truth's. With
      theta > 0 enforced, the same starts land near the true basin
      (VERDICT.md round-1 Missing #3).
    - ``num_starts`` random (X_unobs, theta) initializations optimized in
      one vmapped scan; start 0 uses the reference's theta = ones.
    - Candidate selection: when the observed components' fitted GP
      operators are supplied, the winner is chosen by the OBSERVED-manifold
      score sum_d ||f_d(X_full, theta) - m_d (x_d - mu_d)||^2_{K_d^{-1}}
      (the observed block of the MAGI posterior's t2 — computable before
      the unobserved components' hyperparameters exist), falling back to
      the raw gradient-matching loss otherwise. The GM loss is exactly the
      criterion that prefers degenerate basins; the manifold score uses the
      GP-conditional derivatives and sharper per-direction weighting.
    """
    I = jnp.asarray(np.asarray(I))
    X_obs_s = jnp.asarray(np.asarray(X_obs_smoothed))
    dtype = X_obs_s.dtype
    order = jnp.asarray(np.asarray(proper_order), jnp.int32)
    N_I = X_obs_s.shape[0]
    dt = I[1, 0] - I[0, 0]

    # init heuristics (magi_v2.py:219-226)
    mu_init = float(np.asarray(X_obs_smoothed).mean())
    sd_init = float(np.sqrt((np.asarray(X_obs_smoothed).std(axis=0) ** 2).mean()))
    key = jax.random.PRNGKey(seed)
    k_x, k_t = jax.random.split(key)
    X_unobs0 = mu_init + sd_init * jax.random.normal(
        k_x, (num_starts, N_I, D_unobserved), dtype
    )
    # theta pre-space starts: softplus^{-1}(1) (the reference's ones init)
    # for start 0, wide-normal diversity for the rest
    ones_pre = float(np.log(np.expm1(1.0)))
    th_pre0 = jnp.concatenate(
        [
            jnp.full((1, D_thetas), ones_pre, dtype),
            1.5 * jax.random.normal(k_t, (num_starts - 1, D_thetas), dtype),
        ]
    )

    def x_full_of(X_unobs):
        return jnp.take(
            jnp.concatenate([X_obs_s, X_unobs], axis=1), order, axis=1
        )

    def loss(params):
        X_full = x_full_of(params["X_unobs"])
        thetas = jax.nn.softplus(params["th_pre"])
        f_vals = f_vec(I, X_full, thetas)
        f_diff = (X_full[2:, :] - X_full[:-2, :]) / (2.0 * dt)
        return jnp.sum((f_vals[1:-1] - f_diff) ** 2)

    opt = optax.adam(learning_rate, eps=1e-7)

    use_manifold = (
        m_ds_obs is not None
        and K_invs_obs is not None
        and mu_obs is not None
        and observed_components is not None
    )
    if use_manifold:
        m_j = jnp.asarray(np.asarray(m_ds_obs), dtype)
        K_j = jnp.asarray(np.asarray(K_invs_obs), dtype)
        obs_cols = jnp.asarray(np.asarray(observed_components), jnp.int32)
        m_prod = jnp.einsum(
            "dnm,dm->dn",
            m_j,
            (X_obs_s - jnp.asarray(np.asarray(mu_obs), dtype)[None, :]).T,
        )

        def score(params):
            X_full = x_full_of(params["X_unobs"])
            f_vals = f_vec(I, X_full, jax.nn.softplus(params["th_pre"]))
            resid = f_vals[:, obs_cols].T - m_prod
            return jnp.einsum("dn,dnm,dm->", resid, K_j, resid)
    else:
        score = loss

    @jax.jit
    def run_all(X_unobs0, th_pre0):
        def one_start(x0, t0):
            params0 = {"X_unobs": x0, "th_pre": t0}
            opt_state = opt.init(params0)

            def step(carry, _):
                params, opt_state = carry
                lval, grads = jax.value_and_grad(loss)(params)
                updates, opt_state = opt.update(grads, opt_state)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), lval

            (params, _), losses = jax.lax.scan(
                step, (params0, opt_state), None, length=num_iters
            )
            return params, losses, score(params)

        params, losses, scores = jax.vmap(one_start)(X_unobs0, th_pre0)
        best = jnp.argmin(scores)
        return (
            jax.tree.map(lambda a: a[best], params),
            losses[best],
        )

    params, losses = run_all(X_unobs0, th_pre0)
    return (
        np.asarray(params["X_unobs"]),
        np.asarray(jax.nn.softplus(params["th_pre"])),
        np.asarray(losses),
    )
