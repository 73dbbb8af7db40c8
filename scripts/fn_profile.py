"""Profile-posterior adjudication of FitzHugh-Nagumo's b parameter
(VERDICT round-4 Weak #4 / task 6).

The FN calibration run (results/calibration_table.json "fn": 256 chains,
warmup_only true posterior, N_I=161) recovers theta = (a, b, c) with b's
posterior mean at 0.346 vs truth 0.2 — a +73% relative offset, but only
z = 1.41 posterior sds (sd 0.103). Two independent checks decide whether
that is weak identification (a property of the MAGI posterior, like
Hes1's f/g — DEVIATIONS #23) or a sampler bias:

1. The profile log-posterior over a b grid — same masked-Adam +
   continuation machinery as scripts/hes1_profile.py, on EXACTLY the
   target the calibration run sampled (default model.beta tempering,
   sigma^2 free, beta_temp=1). Reported in NATURAL coordinates: the
   sampler's softplus log-Jacobian of the FIXED coordinate is subtracted
   (it tilts the pre-coordinate profile by ~2 nats across this grid —
   that term belongs to the bijection, not the posterior over b).
2. map_estimate() (exact beta=1-style joint mode of the same tempered
   target, GN-preconditioned) -> the MAP b and its Laplace sd; the
   sampled mean's z-score against the MAP/Laplace pair cross-checks the
   z = 1.41 the table already records against truth.

A profile flat to O(1) nats across [truth, sampled mean] certifies the
offset as weak identification. Writes results/fn_profile.json.

Reference: /root/reference/magi_v2.py has no FN workload and no
identifiability tooling; the FN geometry (V' = c(V - V^3/3 + R),
R' = -(V - a + bR)/c) follows the published MAGI benchmarks.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--out", default="results/fn_profile.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import optax

    from magi_v2_tpu import MAGI_v2
    from magi_v2_tpu.models import fitzhugh_nagumo_f_vec
    from magi_v2_tpu.posterior import softplus_inverse
    from magi_v2_tpu.sampler.magi_state import flatten_state
    from magi_v2_tpu.utils.data import simulate_ode

    # identical data pipeline to scripts/calibration_table.py "fn"
    theta_true = np.array([0.2, 0.2, 3.0])
    ts_obs, X_obs, _ = simulate_ode(
        fitzhugh_nagumo_f_vec, x0=np.array([-1.0, 1.0]),
        thetas=theta_true, t_max=20.0, n_obs=41, noise_sd=0.2,
        substeps=40)
    model = MAGI_v2(D_thetas=3, ts_obs=ts_obs, X_obs=X_obs, bandsize=None,
                    f_vec=fitzhugh_nagumo_f_vec)
    t0 = time.time()
    model.initial_fit(discretization=2)
    dtype = jnp.float64

    # the EXACT target the calibration run sampled: default model.beta
    # tempering, sigma^2 free, beta_temp=1 (warmup_only samples at 1)
    mode, data, sigma_LB, _, _ = model._build_sampling_setup(
        "precond", "dense", dtype
    )
    ND, D = model.mag_I * model.D, model.D

    def pre_init(vals, lower):
        above = vals > lower
        out = np.full_like(vals, -5.0)
        out[above] = np.asarray(
            softplus_inverse(jnp.asarray(vals[above] - lower[above]))
        )
        return out

    sigma_pre0 = pre_init(np.asarray(model.sigma_sqs_init, np.float64),
                          np.asarray(sigma_LB, np.float64))
    theta_pre0 = pre_init(np.asarray(model.thetas_init, np.float64),
                          np.zeros(model.D_thetas))
    q0 = np.asarray(
        flatten_state(
            mode.X0,
            jnp.asarray(sigma_pre0, dtype),
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

    softminus = lambda v: float(np.log(np.expm1(max(v, 1e-8))))
    log_sigmoid = lambda p: float(-np.log1p(np.exp(-p)))

    idx = 1                                      # b
    fix_pos = ND + D + idx
    sampled_mean_b = 0.3457                      # calibration_table "fn"
    grid = np.unique(np.concatenate([
        np.geomspace(0.05, 1.0, 13), [theta_true[idx], sampled_mean_b]
    ]))
    prof = []
    q = q0.copy()
    for v in grid:
        q_init = q.copy()
        pre_v = softminus(v)
        q_init[fix_pos] = pre_v
        q_opt, lp = optimize(jnp.asarray(q_init), fix_pos)
        q = np.asarray(q_opt)                    # continuation warm start
        # natural-coordinate profile: strip the fixed coordinate's
        # softplus log-Jacobian (log sigmoid(pre)) the sampler carries
        lp_nat = float(lp) - log_sigmoid(pre_v)
        prof.append(lp_nat)
        print(f"[fn b] v={v:.4f}  profile lp (natural)={lp_nat:.2f}",
              flush=True)
    prof = np.array(prof)
    i_true = int(np.abs(grid - theta_true[idx]).argmin())
    i_mean = int(np.abs(grid - sampled_mean_b).argmin())

    # cross-check 2: exact joint MAP + Laplace sd of the same model
    r = model.map_estimate()
    map_b = float(r["theta_map"][idx])
    sd_b = float(r["theta_sd"][idx])

    out = {
        "config": (
            f"FN b-parameter profile posterior (natural coordinates), "
            f"CPU f64, masked Adam {args.iters} iters lr={args.lr}, "
            f"sigma free, default beta temper, beta_temp=1 — the "
            f"calibration run's exact target"
        ),
        "grid": [round(float(v), 4) for v in grid],
        "profile_lp_natural": [round(float(v), 2) for v in prof],
        "true_value": float(theta_true[idx]),
        "sampled_posterior_mean": sampled_mean_b,
        "sampled_posterior_sd": 0.1034,
        "argmax_value": round(float(grid[int(prof.argmax())]), 4),
        "lp_drop_at_truth_vs_max": round(float(prof.max() - prof[i_true]), 2),
        "lp_drop_at_sampled_mean_vs_max": round(
            float(prof.max() - prof[i_mean]), 2),
        "map_estimate": {
            "theta_map": np.round(r["theta_map"], 4).tolist(),
            "b_map": round(map_b, 4),
            "b_sd_laplace": round(sd_b, 4),
            "sampled_mean_z_vs_map": round(
                (sampled_mean_b - map_b) / sd_b, 2),
            "converged": bool(r["converged"]),
            "lbfgs_iters": int(r["lbfgs_iters"]),
        },
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs("results", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
