"""Protein-transduction identification probe (VERDICT r4 task 9 +
ADVICE r4: make the model's documented ridge claims verifiable from a
checked-in artifact).

Vyshemirsky & Girolami (2008) model 1, all 5 states observed, uniform
grid t in [0, 60], noise sd 0.01 (the literature's low-noise setting).
Two measurements, written to results/protein_probe.json:

1. MAP + Laplace (exact operators, CPU f64) — the identification
   structure AT THE MAGI POSTERIOR'S OWN MODE: which components are
   sharp (k1, k4), which sit on certified flat directions (V, Km — the
   Michaelis-Menten ridge: z(truth) < 1 with sds spanning the truth),
   and which carry a correlated posterior-intrinsic offset (k2, k3 —
   the S*R / S_R balance admits a compensating direction; both z's and
   the Laplace corr(k2, k3) are recorded). Same adjudication machinery
   as FN's b (scripts/fn_profile.py) and the SEIR/SIRW R offsets: the
   posterior itself — not the sampler — owns the offset.

2. (--sample) the HMC dense-metric sampled posterior at the same
   design, for mean/sd comparison against the MAP/Laplace numbers.
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
    ap.add_argument("--n-obs", type=int, default=61)
    ap.add_argument("--sample", action="store_true")
    ap.add_argument("--chains", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--out", default="results/protein_probe.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp  # noqa: F401

    from magi_v2_tpu import MAGI_v2, MagiConfig
    from magi_v2_tpu.map_laplace import map_estimate
    from magi_v2_tpu.models import protein_transduction_f_vec
    from magi_v2_tpu.utils import summarize_chains
    from magi_v2_tpu.utils.data import simulate_ode

    true = np.array([0.07, 0.6, 0.05, 0.3, 0.017, 0.3])
    names = ["k1", "k2", "k3", "k4", "V", "Km"]
    ts_obs, X_obs, X_true = simulate_ode(
        protein_transduction_f_vec, x0=np.array([1.0, 0.0, 1.0, 0.0, 0.0]),
        thetas=true, t_max=60.0, n_obs=args.n_obs, noise_sd=0.01,
        substeps=100, seed=0,
    )
    model = MAGI_v2(D_thetas=6, ts_obs=ts_obs, X_obs=X_obs, bandsize=None,
                    f_vec=protein_transduction_f_vec, config=MagiConfig())
    t0 = time.time()
    model.initial_fit(discretization=1, verbose=False)
    setup_s = time.time() - t0

    t0 = time.time()
    mp = map_estimate(model, laplace=True, verbose=True)
    map_s = time.time() - t0
    tm, sd = mp["theta_map"], mp["theta_sd"]
    z = (tm - true) / np.maximum(sd, 1e-12)

    # Laplace theta correlations (natural coordinates): the ridge
    # detectors — (k2, k3) compensate through dS_R/dt = k2*S*R -
    # (k3+k4)*S_R; (V, Km) through the near-linear MM regime
    cov = mp["theta_cov"]
    corr = cov / np.sqrt(np.outer(np.diag(cov), np.diag(cov)))

    out = {
        "config": (f"protein transduction V&G model 1, n_obs={args.n_obs} "
                   f"uniform on [0,60], noise_sd=0.01, N_I={model.mag_I}, "
                   "CPU f64 exact operators"),
        "theta_names": names,
        "theta_true": true.tolist(),
        "map": {
            "theta_map": np.round(tm, 5).tolist(),
            "laplace_sd": np.round(sd, 5).tolist(),
            "z_vs_truth": np.round(z, 2).tolist(),
            "V_over_Km_map": round(float(tm[4] / tm[5]), 4),
            "V_over_Km_true": round(float(true[4] / true[5]), 4),
            "converged": bool(mp["converged"]),
            "lbfgs_iters": int(mp["lbfgs_iters"]),
            "hessian_spd": bool(mp["hessian_spd"]),
            "corr_k2_k3": round(float(corr[1, 2]), 3),
            "corr_V_Km": round(float(corr[4, 5]), 3),
            "wall_s": round(map_s, 1),
        },
        "setup_s": round(setup_s, 1),
    }

    if args.sample:
        t0 = time.time()
        res = model.predict(
            num_results=args.steps, num_burnin_steps=args.steps,
            num_chains=args.chains, seed=0, init_jitter=0.01,
            algorithm="hmc", hmc_num_leapfrogs=128, mass_matrix="auto",
        )
        wall = time.time() - t0
        th = np.asarray(res["thetas_samps"])
        s = summarize_chains(th, wall)
        flat = th.reshape(-1, 6)
        out["sampled"] = {
            "theta_mean": np.round(flat.mean(0), 5).tolist(),
            "theta_sd": np.round(flat.std(0), 5).tolist(),
            "V_over_Km_mean": round(float((flat[:, 4] / flat[:, 5]).mean()),
                                    4),
            "ess_min": round(s["ess_min"], 1),
            "rhat_max": round(s["rhat_max"], 4),
            "wall_s": round(wall, 1),
            "note": ("the (V, Km) ridge mixes slowly by construction — "
                     "rhat over the ridge coordinates flags the flat "
                     "direction, not a defect in the sharp components"),
        }

    os.makedirs("results", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
