"""Profile-posterior identifiability analysis for Hes1's weakly-identified
parameters (VERDICT round-2 item 3, identifiability leg).

The long Hes1 runs recover theta_6 (P-production rate, true 20) with a
huge posterior sd and theta_7 (Hill offset, true 0.3) at ~0.5-0.6x truth.
This script measures WHY: the profile log-posterior
    L_prof(v) = max_{all other params} log p(X, sigma_fixed, theta | y)
over a grid of fixed values v for each suspect parameter, holding the
observation-noise variances at their known value (same conditioning as
the recovery runs). A flat profile across a wide range = the data cannot
identify the parameter; the posterior mean offset is then a property of
the MAGI posterior, not a sampler defect.

Optimization: masked Adam in the GN-whitened coordinates (the fixed
parameter's gradient is zeroed; Adam then never moves it), warm-started
by continuation from the previous grid point. Everything runs CPU f64.

Writes results/hes1_profile.json.

Reference: /root/reference/magi_v2.py:182-268 (Hes1 usage);
the reference has no identifiability tooling at all.
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--out", default="results/hes1_profile.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import optax

    from magi_v2_tpu import MAGI_v2
    from magi_v2_tpu.models import MODEL_REGISTRY, hes1_log_f_vec
    from magi_v2_tpu.sampler.magi_state import flatten_state
    from magi_v2_tpu.utils.data import simulate_ode

    # identical data pipeline to scripts/hes1_long.py
    true = np.array(MODEL_REGISTRY["hes1"].true_thetas)
    ts_obs, _, X_true = simulate_ode(
        MODEL_REGISTRY["hes1"].f_vec,
        x0=np.array([1.439, 2.037, 17.904]),
        thetas=true,
        t_max=240.0,
        n_obs=33,
        noise_sd=0.0,
        substeps=200,
    )
    rng = np.random.default_rng(0)
    X_obs_log = np.log(X_true) + 0.15 * rng.standard_normal(X_true.shape)
    X_obs_log[:, 2] = np.nan  # H fully unobserved

    model = MAGI_v2(
        D_thetas=7, ts_obs=ts_obs, X_obs=X_obs_log, bandsize=None,
        f_vec=hes1_log_f_vec,
    )
    t0 = time.time()
    model.initial_fit(discretization=2, verbose=False)
    model.beta = 1.0
    dtype = jnp.float64

    # GN-whitened coordinates: the centered X block is ~1e8-stiff and Adam
    # crawls there; the whitening is a linear X-block-only map (theta
    # coordinates pass through untouched), so masking the theta coordinate
    # still profiles exactly the same posterior, just well-conditioned.
    mode, data, sigma_LB, sig_fix64, pre_fix = model._build_sampling_setup(
        "precond", "dense", dtype, sigma_sqs_fixed=0.15 ** 2
    )
    ND, D = model.mag_I * model.D, model.D

    softminus = lambda v: np.log(np.expm1(np.maximum(v, 1e-8)))
    theta_pre0 = softminus(np.maximum(model.thetas_init, 1e-3))
    q0 = np.asarray(
        flatten_state(
            mode.X0,
            jnp.asarray(pre_fix, dtype),
            jnp.asarray(theta_pre0, dtype),
        )
    )
    lp_fn = mode.logp_grad
    opt = optax.adam(args.lr, eps=1e-8)

    @jax.jit
    def optimize(q, fix_pos):
        st = opt.init(q)

        def step(carry, _):
            q, st = carry
            v, g = lp_fn(q, jnp.asarray(1.0, dtype))
            g = g.at[fix_pos].set(0.0)          # profile: hold one coord
            upd, st = opt.update(jax.tree.map(jnp.negative, g), st)
            return (optax.apply_updates(q, upd), st), v

        (q, _), vals = jax.lax.scan(step, (q, st), None, length=args.iters)
        return q, vals[-1]

    results = {}
    grids = {
        "theta6_P_production": (5, np.geomspace(2.0, 80.0, 13)),
        "theta7_hill_offset": (6, np.geomspace(0.05, 1.2, 13)),
    }
    for name, (idx, grid) in grids.items():
        fix_pos = ND + D + idx
        prof = []
        q = q0.copy()
        for v in grid:
            q_init = q.copy()
            q_init[fix_pos] = softminus(np.array(v))
            q_opt, lp = optimize(jnp.asarray(q_init), fix_pos)
            q = np.asarray(q_opt)               # continuation warm start
            prof.append(float(lp))
            print(f"[{name}] v={v:.3f}  profile lp={float(lp):.2f}",
                  flush=True)
        prof = np.array(prof)
        results[name] = {
            "grid": [round(float(v), 4) for v in grid],
            "profile_lp": [round(float(v), 2) for v in prof],
            "true_value": float(true[idx]),
            "argmax_value": round(float(grid[int(prof.argmax())]), 4),
            "lp_range_over_grid": round(float(prof.max() - prof.min()), 2),
            "lp_drop_at_truth_vs_max": round(
                float(prof.max()
                      - prof[int(np.abs(grid - true[idx]).argmin())]), 2
            ),
        }

    out = {
        "config": (
            f"Hes1 profile posterior, centered f64 CPU, masked Adam "
            f"{args.iters} iters lr={args.lr}, sigma fixed 0.15^2, beta=1"
        ),
        "wall_s": round(time.time() - t0, 1),
        **results,
    }
    os.makedirs("results", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
