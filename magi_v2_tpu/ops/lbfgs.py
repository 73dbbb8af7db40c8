"""Jitted limited-memory BFGS minimizer (pure JAX, single dispatch).

The BASELINE.json north star asks for hyperparameter MLE via "jitted LBFGS
on-device"; the reference itself uses Adam(lr=0.01) x 1000 host-side steps
(magi_v2.py:654,677-678). This module provides the L-BFGS path: the whole
optimization — two-loop recursion, strong-Wolfe line search, early
stopping — runs inside one ``lax.while_loop`` under ``jit``, so a fit is
ONE device dispatch regardless of iteration count (vs the reference's
1000 Python->XLA round trips).

Design notes (XLA-first):

- Static shapes: the (S, Y) curvature history is a fixed ``(m, n)`` ring
  buffer ordered most-recent-first via ``jnp.roll`` (m is small, so the
  roll is negligible next to the objective's Cholesky factorizations).
  Invalid / not-yet-filled slots are masked, not sliced.
- The iteration loop is a ``lax.while_loop`` bounded by ``num_iters``: a
  converged fit stops paying for objective evaluations immediately
  (measured: a scan-with-freeze variant ran line searches for all 200
  slots and was SLOWER than Adam-1000 despite converging in ~40 iters).
  The loss trace lives in a preallocated static-shape buffer.
- The line search is a strong-Wolfe bracketing + bisection-zoom search
  (Nocedal & Wright Alg. 3.5/3.6) in one ``lax.while_loop`` state
  machine. Armijo-only backtracking was measured to stall on curved
  valleys (Rosenbrock: every s'y <= 0 past iteration 3, history goes
  stale, progress degrades to O(1e-3)/iter); the Wolfe curvature
  condition guarantees s'y >= (c2-1) * t * g'd > 0, keeping the implicit
  Hessian positive definite.
- Curvature pairs with s'y <= 1e-10 * |s||y| are still skipped (belt
  and braces for zoom-exhausted fallback steps); the step falls back to
  steepest descent whenever the history is empty.

No reference counterpart: magi_v2.py contains no L-BFGS. Validated in
tests/test_lbfgs.py against closed-form quadratics, the Rosenbrock
function, and the Adam MLE on the SEIR hyperparameter objective.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class LbfgsResult(NamedTuple):
    params: Any          # pytree, same structure as x0
    loss: jax.Array      # objective at ``params``
    grad_norm: jax.Array  # sup-norm of the gradient at ``params``
    converged: jax.Array  # grad_norm <= tol at exit
    num_iters: jax.Array  # iterations actually applied (before freeze)
    losses: jax.Array    # per-iteration loss trace (frozen tail repeats)


def _two_loop(g, S, Y, rho, valid):
    """H·g via the standard two-loop recursion over a masked ring buffer.

    S/Y: (m, n) most-recent-first; rho: (m,) = 1/(s'y); valid: (m,) bool.
    Invalid slots contribute identity (their alpha/beta terms are zeroed),
    so an empty history yields H = gamma * I with gamma = 1.
    """
    m = S.shape[0]

    def fwd(carry, i):
        q, alphas = carry
        a = jnp.where(valid[i], rho[i] * (S[i] @ q), 0.0)
        q = q - a * jnp.where(valid[i], 1.0, 0.0) * Y[i]
        return (q, alphas.at[i].set(a)), None

    (q, alphas), _ = jax.lax.scan(
        fwd, (g, jnp.zeros((m,), g.dtype)), jnp.arange(m)
    )

    # initial Hessian scaling from the most recent valid pair
    sy = S[0] @ Y[0]
    yy = Y[0] @ Y[0]
    gamma = jnp.where(valid[0] & (yy > 0.0), sy / jnp.maximum(yy, 1e-300), 1.0)
    r = gamma * q

    def bwd(r, i):
        b = jnp.where(valid[i], rho[i] * (Y[i] @ r), 0.0)
        r = r + jnp.where(valid[i], 1.0, 0.0) * (alphas[i] - b) * S[i]
        return r, None

    r, _ = jax.lax.scan(bwd, r, jnp.arange(m - 1, -1, -1))
    return r


def lbfgs_minimize(
    fun: Callable[[Any], jax.Array],
    x0: Any,
    num_iters: int = 200,
    history_size: int = 10,
    tol: float = 1e-8,
    c1: float = 1e-4,
    max_backtracks: int = 25,
) -> LbfgsResult:
    """Minimize ``fun`` (scalar, pytree argument) from ``x0``.

    Fully jittable; call under ``jax.jit`` for the single-dispatch path
    (``fit_kernel_hparams(optimizer="lbfgs")`` does). ``tol`` is on the
    sup-norm of the gradient. ``max_backtracks`` is the per-iteration
    line-search evaluation budget (bracketing + zoom trials combined). A
    failed line search (no Armijo point found within budget) freezes the
    iteration — the current iterate is returned with ``converged``
    reporting the gradient test only.
    """
    x0_flat, unravel = ravel_pytree(x0)
    n = x0_flat.shape[0]
    dtype = x0_flat.dtype
    m = history_size

    def f_flat(x):
        return fun(unravel(x))

    vg = jax.value_and_grad(f_flat)

    f0, g0 = vg(x0_flat)

    def line_search(x, f0, g0, d):
        """Strong-Wolfe search along the descent direction ``d``.

        One ``while_loop`` runs both phases of Nocedal & Wright Alg.
        3.5/3.6 (bisection zoom): state 0 brackets by doubling from t=1,
        state 1 zooms. The zoom invariant — ``lo`` always satisfies
        Armijo — makes ``lo`` the safe fallback when the eval budget
        runs out. Returns ``(t, f_t, g_t, ok)``; the gradient at the
        accepted point is returned so the caller never re-evaluates.
        """
        dphi0 = g0 @ d
        c2 = jnp.asarray(0.9, dtype)        # standard for quasi-Newton
        one = jnp.asarray(1.0, dtype)
        zero = jnp.asarray(0.0, dtype)

        # carry: (state, i, t, lo, f_lo, g_lo, hi, acc_t, acc_f, acc_g)
        #   state: 0 bracket, 1 zoom, 2 accepted, 3 failed
        #   lo satisfies Armijo by construction (lo=0 initially)
        def cond(c):
            state, i = c[0], c[1]
            return (state < 2) & (i < max_backtracks)

        def body(c):
            state, i, t, lo, f_lo, g_lo, hi, acc_t, acc_f, acc_g = c
            f_t, g_t = vg(x + t * d)
            dphi_t = g_t @ d
            armijo = f_t <= f0 + c1 * t * dphi0
            curv = jnp.abs(dphi_t) <= -c2 * dphi0
            nan_t = ~jnp.isfinite(f_t)

            accept = armijo & curv & ~nan_t

            if True:  # bracket-phase transitions (state == 0)
                # Armijo fail / no-progress / NaN -> zoom into (lo, t)
                br_to_zoom_hi = (~armijo) | (f_t >= f_lo) | nan_t
                # positive slope with Armijo ok -> zoom into (t, lo)
                br_pos_slope = armijo & ~curv & (dphi_t >= 0) & ~nan_t
                b_state = jnp.where(
                    accept, 2,
                    jnp.where(br_to_zoom_hi | br_pos_slope, 1, 0))
                b_lo = jnp.where(br_pos_slope, t, lo)
                b_f_lo = jnp.where(br_pos_slope, f_t, f_lo)
                b_g_lo = jnp.where(br_pos_slope, g_t, g_lo)
                b_hi = jnp.where(br_to_zoom_hi, t,
                                 jnp.where(br_pos_slope, lo, hi))
                # extend the bracket; next zoom candidate is the midpoint
                b_t = jnp.where(
                    b_state == 1, 0.5 * (b_lo + b_hi),
                    jnp.where(br_pos_slope | br_to_zoom_hi | accept,
                              t, 2.0 * t))
                # keep walking lo forward while bracketing
                b_lo = jnp.where(b_state == 0, t, b_lo)
                b_f_lo = jnp.where(b_state == 0, f_t, b_f_lo)
                b_g_lo = jnp.where(b_state == 0, g_t, b_g_lo)

            if True:  # zoom-phase transitions (state == 1)
                z_shrink_hi = (~armijo) | (f_t >= f_lo) | nan_t
                # slope points away from hi: hi <- lo before lo <- t
                z_flip = (~z_shrink_hi) & ~curv & (dphi_t * (hi - lo) >= 0)
                z_state = jnp.where(accept, 2, 1)
                z_hi = jnp.where(z_shrink_hi, t, jnp.where(z_flip, lo, hi))
                z_lo = jnp.where(z_shrink_hi, lo, t)
                z_f_lo = jnp.where(z_shrink_hi, f_lo, f_t)
                z_g_lo = jnp.where(z_shrink_hi, g_lo, g_t)
                z_t = 0.5 * (z_lo + z_hi)
                # interval collapsed -> take lo (Armijo-safe) and stop
                # (dtype-aware: a fixed 1e-12 never fires in float32 and
                # would burn the whole eval budget on collapsed brackets)
                z_done = jnp.abs(z_hi - z_lo) <= (
                    10 * jnp.finfo(dtype).eps
                ) * jnp.maximum(one, jnp.abs(z_lo))
                z_state = jnp.where(z_done & (z_state == 1),
                                    jnp.where(z_lo > 0, 2, 3), z_state)

            in_zoom = state == 1
            n_state = jnp.where(in_zoom, z_state, b_state)
            n_lo = jnp.where(in_zoom, z_lo, b_lo)
            n_f_lo = jnp.where(in_zoom, z_f_lo, b_f_lo)
            n_g_lo = jnp.where(in_zoom, z_g_lo, b_g_lo)
            n_hi = jnp.where(in_zoom, z_hi, b_hi)
            n_t = jnp.where(in_zoom, z_t, b_t)

            # on acceptance record the evaluated point — unless the zoom
            # collapsed, where the recorded lo is the accepted point
            took_lo = in_zoom & z_done & (z_state == 2) & ~accept
            a_t = jnp.where(accept, t, jnp.where(took_lo, z_lo, acc_t))
            a_f = jnp.where(accept, f_t, jnp.where(took_lo, z_f_lo, acc_f))
            a_g = jnp.where(accept, g_t, jnp.where(took_lo, z_g_lo, acc_g))

            return (jnp.asarray(n_state, jnp.int32), i + 1, n_t, n_lo,
                    n_f_lo, n_g_lo, n_hi, a_t, a_f, a_g)

        init = (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                one, zero, f0, g0, zero, zero, f0, g0)
        out = jax.lax.while_loop(cond, body, init)
        state, _i, _t, lo, f_lo, g_lo, _hi, acc_t, acc_f, acc_g = out

        # budget exhausted mid-search: fall back to the Armijo-safe lo
        fell_back = (state < 2) & (lo > 0)
        t = jnp.where(state == 2, acc_t, jnp.where(fell_back, lo, zero))
        f_t = jnp.where(state == 2, acc_f, jnp.where(fell_back, f_lo, f0))
        g_t = jnp.where(state == 2, acc_g,
                        jnp.where(fell_back, g_lo, g0))
        ok = (state == 2) | fell_back
        return t, f_t, g_t, ok

    def step(carry):
        x, f, g, S, Y, rho, valid, done, iters, losses = carry

        d = -_two_loop(g, S, Y, rho, valid)
        # safeguard: if the two-loop direction is not a descent direction
        # (possible right after skipped updates in ill-scaled regions),
        # fall back to steepest descent
        descent = (g @ d) < 0.0
        d = jnp.where(descent, d, -g)

        t, f_new, g_new, ok = line_search(x, f, g, d)
        x_new = x + t * d

        s = x_new - x
        y = g_new - g
        sy = s @ y
        keep_pair = sy > 1e-10 * jnp.linalg.norm(s) * jnp.linalg.norm(y)

        S_new = jnp.where(keep_pair, jnp.roll(S, 1, axis=0).at[0].set(s), S)
        Y_new = jnp.where(keep_pair, jnp.roll(Y, 1, axis=0).at[0].set(y), Y)
        rho_new = jnp.where(
            keep_pair,
            jnp.roll(rho, 1).at[0].set(1.0 / jnp.maximum(sy, 1e-300)),
            rho,
        )
        valid_new = jnp.where(
            keep_pair, jnp.roll(valid, 1).at[0].set(True), valid
        )

        gnorm = jnp.max(jnp.abs(g_new))
        done_new = done | (gnorm <= tol) | (~ok)

        return (
            x_new, f_new, g_new, S_new, Y_new, rho_new, valid_new,
            done_new, iters + 1, losses.at[iters].set(f_new),
        )

    # while_loop (not scan): a converged fit stops paying for line-search
    # evaluations immediately — the hyperparameter MLE typically converges
    # in a small fraction of ``num_iters``, and each iteration costs 1-3
    # objective Cholesky factorizations. The loss trace lives in a
    # preallocated buffer (static shape) whose frozen tail repeats the
    # final loss, matching the old scan-with-freeze semantics.
    def cond(carry):
        done, iters = carry[7], carry[8]
        return (~done) & (iters < num_iters)

    init = (
        x0_flat, f0, g0,
        jnp.zeros((m, n), dtype), jnp.zeros((m, n), dtype),
        jnp.zeros((m,), dtype), jnp.zeros((m,), bool),
        jnp.asarray(False), jnp.asarray(0, jnp.int32),
        jnp.full((num_iters,), jnp.inf, dtype),
    )
    x, f, g, _S, _Y, _rho, _valid, done, iters, losses = (
        jax.lax.while_loop(cond, step, init)
    )
    # frozen tail: repeat the final loss so downstream consumers see a
    # monotone trace of static length
    losses = jnp.where(jnp.arange(num_iters) < iters, losses, f)
    gnorm = jnp.max(jnp.abs(g))
    return LbfgsResult(
        params=unravel(x),
        loss=f,
        grad_norm=gnorm,
        converged=gnorm <= tol,
        num_iters=iters,
        losses=losses,
    )
