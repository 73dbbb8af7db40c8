"""Exact-posterior MAP + Laplace approximation for MAGI.

Why this exists (round-4 adjudication, results/lorenz_joint_map_probe.json
+ BASELINE_MEASURED round4): at dense grids (Lorenz N_I=1025) the EXACT
beta=1 MAGI posterior is unbiased — its joint mode recovers theta to
within ~0.7% — but it is intrinsically too stiff for fixed-metric HMC
(the K^{-1} manifold operator scales ~h^-4; measured frozen step sizes
3.9e-4..7e-6), and the band-truncated posterior the tractable sampler
targets is a materially different distribution (theta mode ~(-16, -7,
-11)% off at b=100, where 63% of K^{-1}'s Frobenius mass is off-band).
Optimization does not care about stiffness: a whitened L-BFGS-B drive of
the exact posterior converges in minutes on CPU float64. This module
productizes that probe as ``MAGI_v2.map_estimate()`` — the accurate
dense-grid point estimate with Laplace credible intervals, complementing
``predict()`` (which samples, exactly where sampling is tractable).

Method: whiten the trajectory block (a pure coordinate change —
conditioning only), optimize the negative unnormalized log posterior
(the reference's 4-term form, magi_v2.py:308-348, beta_temp=1) over
(w, theta) with Adam (jitted lax.scan) then SciPy L-BFGS-B with
positivity bounds. Two whitenings (``precondition=``):

- ``"gn"`` (default): the banded Gauss-Newton Cholesky factor U the
  sampler already builds (sampler/precond.py) — w = U (x - mu),
  unwhitened per evaluation by the exact O(ND*b) block-banded back
  substitution. The GN factor captures the ODE-Jacobian coupling the
  prior factor misses, so the whitened objective is ~unit-curvature and
  L-BFGS-B converges in a few hundred iterations where the prior
  whitening needed tens of thousands (measured, Lorenz N_I=1025:
  27,442 iters / 1100 s -> see results/lorenz1025_map.json round 5).
  Band truncation of U affects conditioning only, never the optimum.
- ``"prior"``: the GP-prior factor C^{1/2} (the round-4 path, kept as
  the fallback; per-component, ignores cross-component ODE curvature). Free sigma^2 is
PROFILED analytically per step (closed form SSE_d/N_d clipped at the LB
heuristic, envelope theorem via stop_gradient) — explicit sigma
coordinates stalled L-BFGS-B line searches on their 1/sigma^2 curvature
(measured: projected gradient pinned at ~10-160 over 4 restarts; the
profiled form converges in ~250 iterations). Curvature via a chunked
forward-over-reverse Hessian at the MAP (sigma conditioned at its MAP),
theta/X credible sds from the inverse Hessian. Everything runs on CPU in
float64 (model._setup_device_ctx) — the kernel-matrix conditioning rules
from CLAUDE.md apply here exactly as in setup.

No reference counterpart: the reference library is sampling-only and
cannot run this regime at all (its bandsize option stores truncated
operators dense, magi_v2.py:271-274).
"""

from __future__ import annotations

import time

import numpy as np


def _sym_sqrt_np(A):
    w, v = np.linalg.eigh((A + A.T) / 2.0)
    w = np.maximum(w, 0.0)
    return (v * np.sqrt(w)) @ v.T


def _sym_sqrt_inv_np(A_inv):
    """C^{1/2} from C^{-1}, pinv-consistent (zero eigenvalues stay zero)."""
    w, v = np.linalg.eigh((A_inv + A_inv.T) / 2.0)
    w = np.maximum(w, 0.0)
    s = np.where(w > w.max() * 1e-14,
                 1.0 / np.sqrt(np.maximum(w, 1e-300)), 0.0)
    return (v * s) @ v.T


def _hessian_chunked(grad_fn, z, chunk=256):
    """Dense (dim, dim) Hessian of a scalar function via forward-over-
    reverse JVPs of its gradient, in basis chunks (bounds peak memory to
    chunk x dim instead of dim x dim tangents)."""
    import jax
    import jax.numpy as jnp

    dim = z.shape[0]
    eye = jnp.eye(dim, dtype=z.dtype)

    @jax.jit
    def hvp_block(tangents):
        return jax.vmap(
            lambda t: jax.jvp(grad_fn, (z,), (t,))[1]
        )(tangents)

    rows = [np.asarray(hvp_block(eye[i:i + chunk]))
            for i in range(0, dim, chunk)]
    H = np.concatenate(rows, axis=0)
    return (H + H.T) / 2.0


def map_estimate(
    model,
    sigma_sqs_fixed=None,
    adam_steps: int = 1000,
    adam_lr: float = 0.02,
    lbfgs_maxiter: int = 20000,
    laplace: bool = True,
    verbose: bool = False,
    laplace_draws: int = 0,
    draws_seed: int = 0,
    draws_scale: float = 1.0,
    draws_rel_floor: float = 1e-9,
    precondition: str = "gn",
):
    """Joint MAP of the EXACT (untruncated, beta_temp=1) MAGI posterior
    over (X, theta[, sigma^2]), with optional Laplace credible sds.

    sigma_sqs_fixed: scalar or (D,) known observation-noise variances; when
    None, sigma^2 is optimized jointly (bounded below by the predict()
    sigma_sqs_LB heuristic).

    laplace_draws: number of JOINT draws from the Laplace approximation
    N(z_map, draws_scale^2 * H^{-1}) to return as natural-coordinate
    ``X_draws`` (n, N_I, D) / ``theta_draws`` (n, D_thetas) — correctly
    dispersed chain starts for predict(init_states=...) (the measured fix
    for slow unobserved-component mixing, Hes1 H). Near-flat Hessian
    directions (eigenvalue < draws_rel_floor * max) have their draw
    variance CAPPED at 1/(draws_rel_floor * w_max) — the Laplace sd is
    meaningless along measured flat directions (Hes1 f/g profiles flat
    over decades) and uncapped draws would eject chains from the basin.
    theta draws are clipped at the positivity bound.

    precondition: "gn" (banded Gauss-Newton whitening, default — see the
    module docstring) or "prior" (GP-prior C^{1/2} whitening). The MAP is
    identical either way (both are exact linear coordinate changes); only
    optimizer conditioning differs.

    Returns a dict: theta_map, sigma_sqs_map, X_map (N_I, D), neg_logpost,
    grad_norm, lbfgs_iters, converged, band_truncation_bypassed, and (with
    laplace=True) theta_sd, X_sd, hessian_spd. The MAP is taken in natural
    (constrained) coordinates — positivity enforced by L-BFGS-B bounds,
    not a softplus Jacobian.
    """
    import jax

    if precondition not in ("gn", "prior"):
        raise ValueError(f"precondition must be 'gn' or 'prior', got "
                         f"{precondition!r}")
    with model._setup_device_ctx():
        return _map_estimate_impl(
            model, sigma_sqs_fixed, adam_steps, adam_lr, lbfgs_maxiter,
            laplace or laplace_draws, verbose, laplace_draws, draws_seed,
            draws_scale, draws_rel_floor, precondition,
        )


def _map_estimate_impl(model, sigma_sqs_fixed, adam_steps, adam_lr,
                       lbfgs_maxiter, laplace, verbose, laplace_draws=0,
                       draws_seed=0, draws_scale=1.0, draws_rel_floor=1e-9,
                       precondition="gn"):
    import jax
    import jax.numpy as jnp
    import optax
    from scipy.optimize import minimize

    t_start = time.time()
    D, D_th, N = model.D, model.D_thetas, model.mag_I
    cfg = model.config

    # exact operators: rebuild untruncated when the model was banded
    # (initial_fit truncates in place — the whole point here is to evaluate
    # the posterior the truncation approximates)
    bypassed = model.BANDSIZE is not None
    if bypassed:
        C_inv, m_ds, K_inv = model._build_inverse_matrices(
            model.phi1s, model.phi2s
        )
    else:
        C_inv, m_ds, K_inv = model.C_d_invs, model.m_ds, model.K_d_invs
    C_inv = np.asarray(C_inv, np.float64)
    m_ds = np.asarray(m_ds, np.float64)
    K_inv = np.asarray(K_inv, np.float64)
    mu = np.asarray(model.mu_ds, np.float64)
    beta = float(model.beta)
    oi = model.obs_index
    N_ds = np.asarray(oi.N_ds, np.float64)

    R = np.stack([_sym_sqrt_np(C_inv[d]) for d in range(D)])
    S = np.stack([_sym_sqrt_np(K_inv[d]) for d in range(D)])
    Sj = jnp.asarray(S)

    gn = precondition == "gn"
    if gn:
        # banded Gauss-Newton whitening — the factor the SAMPLER uses
        # (sampler/precond.py): w = U (x - mu) with U the banded Cholesky
        # of the GN precision at the init point, built from the EXACT
        # factored operators (band-truncated internally: preconditioner
        # quality only, the optimum is unchanged). Unwhitening per
        # evaluation is the exact O(ND*b) block-banded back substitution.
        from magi_v2_tpu.ops.banded import (
            banded_diag_tile_inverses,
            banded_to_blocks_upper,
            block_banded_matvec_upper,
            block_banded_triangular_solve_upper,
        )
        from magi_v2_tpu.sampler.precond import build_gn_cholesky_banded

        U_band, gn_info = build_gn_cholesky_banded(
            model,
            sigma_sqs_init=None if sigma_sqs_fixed is None else np.broadcast_to(
                np.asarray(sigma_sqs_fixed, np.float64), (D,)),
            C_inv_sqrts=R, K_inv_sqrts=S,
        )
        U_blocks = jnp.asarray(banded_to_blocks_upper(jnp.asarray(U_band)))
        U_dinv = banded_diag_tile_inverses(U_blocks, N * D)
        Rj = jnp.asarray(R)
        m_j = jnp.asarray(m_ds)

        def to_xc(w_flat):
            """x - mu (N, D) from whitened w: exact back substitution."""
            return block_banded_triangular_solve_upper(
                U_blocks, w_flat, diag_inv=U_dinv
            ).reshape(N, D)
    else:
        C_half = np.stack([_sym_sqrt_inv_np(C_inv[d]) for d in range(D)])
        A = jnp.asarray(np.einsum("dij,djk->dik", R, C_half))   # t1 factor
        M = jnp.asarray(np.einsum("dij,djk->dik", m_ds, C_half))  # m xc
        Ch = jnp.asarray(C_half)
    idxs = jnp.asarray(oi.not_nan_idxs, jnp.int32)
    cols = jnp.asarray(oi.not_nan_cols, jnp.int32)
    y_obs = jnp.asarray(oi.y_observed, jnp.float64)
    grid_I = jnp.asarray(model.I, jnp.float64)
    mu_j = jnp.asarray(mu)
    N_ds_j = jnp.asarray(N_ds)

    sigma_free = sigma_sqs_fixed is None
    if sigma_free:
        sig_lb_j = jnp.asarray(np.maximum(
            (np.asarray(model.Xhat_init).std(axis=0)
             * cfg.sigma_sq_lb_scale) ** 2,
            1e-12,
        ))
    else:
        sig_fix = np.broadcast_to(
            np.asarray(sigma_sqs_fixed, np.float64), (D,)
        ).copy()

    def unpack(z):
        return z[: N * D].reshape(N, D), z[N * D:]

    def sigma_profile(x_at_obs):
        """Closed-form per-component sigma^2 optimum given the trajectory:
        argmin_s 0.5*(N_d log(2 pi s) + SSE_d / s) = SSE_d / N_d, clipped
        at the LB heuristic. Eliminating sigma analytically (instead of
        optimizing explicit sigma coordinates) removes the 1/sigma^2
        curvature blowup that stalled L-BFGS-B line searches at the bound
        (measured: projected gradient stuck at ~10-160 over 4 restarts).
        stop_gradient implements the envelope theorem exactly: at an
        interior optimum dL/dsigma = 0; at the clipped LB sigma is locally
        constant."""
        se = (x_at_obs - y_obs) ** 2
        sse = jnp.zeros(D, se.dtype).at[cols].add(se)
        sig = jnp.maximum(sse / N_ds_j, sig_lb_j)
        return jax.lax.stop_gradient(sig), sse

    def neg_lp(z):
        w, theta = unpack(z)
        if gn:
            xc = to_xc(w.reshape(-1))                        # (N, D)
            x = xc + mu_j[None, :]
            t1 = jnp.sum(jnp.einsum("dnm,md->dn", Rj, xc) ** 2)
            f = model.f_vec(grid_I, x, theta)                # (N, D)
            r = f.T - jnp.einsum("dnm,md->dn", m_j, xc)      # (D, N)
        else:
            x = jnp.einsum("dnm,md->nd", Ch, w) + mu_j[None, :]
            t1 = jnp.sum(jnp.einsum("dnm,md->nd", A, w) ** 2)
            f = model.f_vec(grid_I, x, theta)                # (N, D)
            r = f.T - jnp.einsum("dnm,md->dn", M, w)         # (D, N)
        t2 = jnp.sum(jnp.einsum("dnm,dm->dn", Sj, r) ** 2)
        x_at_obs = jnp.take(x.reshape(-1), idxs)
        if sigma_free:
            sig, _ = sigma_profile(x_at_obs)
        else:
            sig = jnp.asarray(sig_fix)
        inv_var = jnp.take(1.0 / sig, cols)
        t4 = jnp.sum((x_at_obs - y_obs) ** 2 * inv_var)
        t3 = jnp.sum(N_ds_j * jnp.log(2.0 * jnp.pi * sig))
        return 0.5 * ((t1 + t2) / beta + t3 + t4)

    # init: w from Xhat_init, theta from thetas_init
    xc0 = np.asarray(model.Xhat_init, np.float64) - mu[None, :]
    if gn:
        w0 = np.asarray(
            block_banded_matvec_upper(U_blocks, jnp.asarray(xc0.reshape(-1)))
        ).reshape(N, D)
    else:
        w0 = np.einsum("dnm,md->nd", R, xc0)
    th0 = np.maximum(np.asarray(model.thetas_init, np.float64), 1e-8)
    z0 = np.concatenate([w0.reshape(-1), th0])
    dim = z0.shape[0]

    fg = jax.jit(jax.value_and_grad(neg_lp))

    if adam_steps:
        opt = optax.adam(adam_lr)

        @jax.jit
        def adam_run(z):
            st = opt.init(z)

            def step(carry, _):
                z, st = carry
                v, g = fg(z)
                upd, st = opt.update(g, st)
                return (optax.apply_updates(z, upd), st), v

            (z, _), vals = jax.lax.scan(step, (z, st), None,
                                        length=adam_steps)
            return z, vals

        zj, vals = adam_run(jnp.asarray(z0))
        z0 = np.array(zj)        # writable copy (np.asarray views jax buffers)
        # Adam can push bounded coordinates negative; clamp before L-BFGS-B
        z0[N * D:] = np.maximum(z0[N * D:], 1e-8)
        if verbose:
            print(f"[map] adam {adam_steps} steps: F "
                  f"{float(vals[0]):.2f} -> {float(vals[-1]):.2f}")

    def fun_np(z):
        v, g = fg(jnp.asarray(z))
        return float(v), np.asarray(g)

    bounds = [(None, None)] * (N * D) + [(1e-10, None)] * D_th
    lbs = np.array([b[0] if b[0] is not None else -np.inf for b in bounds])

    def projected(z, g):
        """First-order optimality: zero the gradient where it points out of
        an ACTIVE lower bound (sigma^2 at the LB heuristic, theta at 0) —
        the raw gradient there is legitimately huge and meaningless."""
        g = np.asarray(g).copy()
        act = (z <= lbs * (1 + 1e-9) + 1e-300) & (g > 0)
        g[act] = 0.0
        return g, act

    # L-BFGS-B can stop on a failed line search while far from optimal
    # when bound-pinned sigma^2 coordinates leave a badly mixed curvature
    # scale; a fresh restart (cleared curvature-pair memory) from the
    # current point recovers — loop until the projected gradient is small
    sol, nit_total = None, 0
    for attempt in range(4):
        sol = minimize(fun_np, z0, jac=True, method="L-BFGS-B",
                       bounds=bounds,
                       options={"maxiter": lbfgs_maxiter, "maxcor": 50,
                                "ftol": 1e-16, "gtol": 1e-8})
        nit_total += int(sol.nit)
        z0 = sol.x
        g, active = projected(sol.x, sol.jac)
        grad_norm = float(np.linalg.norm(g))
        if verbose:
            print(f"[map] L-BFGS-B pass {attempt}: nit={sol.nit} "
                  f"F={sol.fun:.3f} |g_proj|={grad_norm:.3g} "
                  f"active_bounds={int(active.sum())}")
        if sol.success or grad_norm <= 1e-3 * (1.0 + abs(sol.fun)):
            break
    z_map = sol.x

    w_map, theta_map = (np.asarray(a) for a in unpack(jnp.asarray(z_map)))
    if gn:
        X_map = np.asarray(to_xc(jnp.asarray(w_map.reshape(-1)))) + mu[None, :]
        # dense T = U^{-1} (x_flat = mu_flat + T w): only needed to push
        # the Laplace covariance / draws from w- to x-coordinates
        if laplace:
            import scipy.linalg

            from magi_v2_tpu.ops.banded_host import band_to_scipy_upper

            T_unwhiten = scipy.linalg.solve_banded(
                (0, (U_band.shape[0] - 1) // 2),
                band_to_scipy_upper(np.asarray(U_band, np.float64)),
                np.eye(N * D),
            )
    else:
        X_map = np.einsum("dnm,md->nd", C_half, w_map) + mu[None, :]
    if sigma_free:
        x_at_obs = X_map.reshape(-1)[np.asarray(oi.not_nan_idxs)]
        sig_map = np.asarray(
            sigma_profile(jnp.asarray(x_at_obs))[0], np.float64)
    else:
        sig_map = sig_fix

    out = {
        "theta_map": theta_map,
        "sigma_sqs_map": sig_map,
        "X_map": X_map,
        "neg_logpost": float(sol.fun),
        "grad_norm": grad_norm,
        "lbfgs_iters": nit_total,
        "lbfgs_message": str(sol.message),
        "active_bounds": int(active.sum()),
        # L-BFGS-B's own success flag can be False on benign line-search
        # termination with active bounds; a small PROJECTED gradient is the
        # actual first-order optimality condition
        "converged": bool(sol.success
                          or grad_norm <= 1e-3 * (1.0 + abs(sol.fun))),
        "band_truncation_bypassed": bypassed,
        "precondition": precondition,
        "wall_s": time.time() - t_start,
    }
    if gn:
        out["gn_jitter"] = float(gn_info["jitter"])
        out["gn_bw_precision"] = int(gn_info["bw_precision"])

    if laplace:
        grad_fn = jax.jit(jax.grad(neg_lp))
        H = _hessian_chunked(grad_fn, jnp.asarray(z_map))
        # flat directions (measured: Hes1 f/g profiles flat over decades)
        # make H singular; pinv-style eigendecomposition handles both cases
        w_eig, V = np.linalg.eigh(H)
        spd = bool(w_eig.min() > 0)
        w_clip = np.maximum(w_eig, w_eig.max() * 1e-12)
        H_inv = (V / w_clip[None, :]) @ V.T
        th_sl = slice(N * D, N * D + D_th)
        out["theta_sd"] = np.sqrt(np.diag(H_inv[th_sl, th_sl]))
        # full theta Laplace covariance (natural coordinates): the ridge
        # detector — e.g. protein transduction's compensating (k2, k3)
        # direction and the (V, Km) MM ridge show up as |corr| ~ 1 here
        out["theta_cov"] = H_inv[th_sl, th_sl]
        if gn:
            # x_flat = mu_flat + T w (T = U^{-1} mixes components), so
            # var(x_flat) = diag(T Hww T')
            Hww = H_inv[: N * D, : N * D]
            X_var = np.einsum(
                "ij,ij->i", T_unwhiten @ Hww, T_unwhiten
            ).reshape(N, D)
        else:
            # x[:, d] = mu_d + C_half[d] @ w[:, d], so
            # var(x[n, d]) = diag(C_half[d] Hww[:, d, :, d] C_half[d]')[n]
            Hw = H_inv[: N * D, : N * D].reshape(N, D, N, D)
            X_var = np.stack(
                [np.einsum("nm,mk,nk->n", C_half[d], Hw[:, d, :, d],
                           C_half[d], optimize=True)
                 for d in range(D)], axis=1)
        out["X_sd"] = np.sqrt(np.maximum(X_var, 0.0))
        out["hessian_spd"] = spd
        out["hessian_min_eig_rel"] = float(w_eig.min() / w_eig.max())

        if laplace_draws:
            # joint draws z = z_map + scale * V diag(w_draw^{-1/2}) eps:
            # cov = scale^2 V w_draw^{-1} V' — H^{-1} with near-flat
            # directions' variance capped (see the docstring)
            rng = np.random.default_rng(draws_seed)
            w_draw = np.maximum(w_eig, w_eig.max() * draws_rel_floor)
            half = V / np.sqrt(w_draw)[None, :]
            eps = rng.standard_normal((laplace_draws, z_map.shape[0]))
            zs = z_map[None, :] + draws_scale * (eps @ half.T)
            if gn:
                out["X_draws"] = (
                    (zs[:, : N * D] @ T_unwhiten.T)
                    .reshape(laplace_draws, N, D) + mu[None, None, :]
                )
            else:
                W = zs[:, : N * D].reshape(laplace_draws, N, D)
                out["X_draws"] = (
                    np.einsum("dnm,cmd->cnd", C_half, W) + mu[None, None, :]
                )
            out["theta_draws"] = np.maximum(zs[:, N * D :], 1e-8)

    return out
