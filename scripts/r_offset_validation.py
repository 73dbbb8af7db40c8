"""Independent validation of the SEIR R-trajectory offset (VERDICT round-2
item 2).

Round 2 loosened the golden coverage test (tests/test_golden_seir.py) on
the strength of this codebase's own measurements: the R component sits
~0.25 observation-noise-sd off the truth with ~1-noise-sd CIs, identically
in centered and GN-whitened coordinates. Both coordinate systems share the
same operators, so that was self-corroboration. This script breaks the
circularity two ways:

1. OPERATORS: rebuilds C^{-1}, m, K^{-1} from scratch with SciPy Bessel
   functions and finite differences (no code shared with
   magi_v2_tpu.ops.bessel/kernels — the derivative matrices come from
   central differences of scipy.special.kv), reference-exact pipeline
   (np.linalg.pinv then band truncation, magi_v2.py:118-128,271-274,
   774-823), and compares them to the library's.
2. POSTERIOR + SAMPLER: runs the reference-parity configuration (centered
   parameterization, anneal_mode='reference', hparam_fit_points='grid',
   single chain, long f64 run — the closest runnable analog of the TFP
   reference, whose HEAD crashes, SURVEY.md §4) and scores the sampled
   draws with a NumPy transliteration of magi_v2.py:308-348 evaluated
   through the INDEPENDENT SciPy operators. If the fused JAX posterior
   disagreed with the independent stack anywhere the sampler actually
   goes, the lp comparison catches it; if they agree and the R offset
   persists, the offset is a property of the MAGI posterior on this data,
   not an implementation artifact.

Caveat found by the first run (results/r_offset_validation.json): the
reference's own annealing never warms past beta_temp = 0.1
(max(1/log(step+2), 0.1), magi_v2.py:833-835), so the reference-parity
posterior is the 10x-flattened one — sigma^2 inflates, theta collapses
(0.34, 0.012, 0.086), and "coverage" is an artifact of the inflated CIs.
Run with --anneal-mode warmup_only for the statistically meaningful
variant: the UNTEMPERED posterior, still scored through the fully
independent operator stack (results/r_offset_validation_untempered.json).

Writes results/r_offset_validation<suffix>.json.
"""

import argparse
import json
import os
import time

import numpy as np
import scipy.special as sps

NU = 2.01


def matern_scipy(s, t, phi1, phi2):
    """Scalar Matern kernel via SciPy (same oracle as tests/test_kernels)."""
    l = np.abs(s - t)
    u = np.sqrt(2 * NU) * l / phi2
    with np.errstate(invalid="ignore"):
        val = phi1 * 2.0 ** (1 - NU) / sps.gamma(NU) * u ** NU * sps.kv(NU, u)
    return np.where(l == 0.0, phi1, val)


def scipy_operators(I, phi1, phi2, bandsize):
    """(C_inv, m, K_inv) for one component, fully independent of the
    library: SciPy kernel + finite-difference derivative matrices +
    np.linalg.pinv + band truncation (reference pipeline
    magi_v2.py:118-128,271-274,774-823)."""
    s = I[:, None]
    t = I[None, :]
    C = matern_scipy(s, t, phi1, phi2)
    h = 1e-6
    # dK/ds via central differences of the SciPy kernel (off-diagonal);
    # the diagonal limit is 0 by symmetry (magi_v2.py:802)
    Kp = (matern_scipy(s + h, t, phi1, phi2)
          - matern_scipy(s - h, t, phi1, phi2)) / (2 * h)
    np.fill_diagonal(Kp, 0.0)
    # d2K/ds dt via cross differences; diagonal limit nu*phi1/(phi2^2(nu-1))
    h2 = 1e-4
    Kpp = (
        matern_scipy(s + h2, t + h2, phi1, phi2)
        - matern_scipy(s + h2, t - h2, phi1, phi2)
        - matern_scipy(s - h2, t + h2, phi1, phi2)
        + matern_scipy(s - h2, t - h2, phi1, phi2)
    ) / (4 * h2 * h2)
    np.fill_diagonal(Kpp, NU * phi1 / (phi2 ** 2 * (NU - 1.0)))

    C_pinv = np.linalg.pinv(C, hermitian=True)
    m = Kp @ C_pinv
    Kd = Kpp - Kp @ C_pinv @ Kp.T
    C_inv = C_pinv
    K_inv = np.linalg.pinv(Kd, hermitian=True)

    n = len(I)
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    mask = np.abs(i - j) <= bandsize
    return (np.where(mask, C_inv, 0.0), np.where(mask, m, 0.0),
            np.where(mask, K_inv, 0.0))


def transliterated_lp(X, sigma_pre, theta_pre, beta_temp, C_invs, m_ds,
                      K_invs, mu_ds, beta, N_ds, not_nan_idxs, not_nan_cols,
                      y_obs, sigma_LB, f_np):
    """NumPy transliteration of magi_v2.py:308-348 (same as
    tests/test_posterior.py)."""
    softplus = lambda x: np.logaddexp(0.0, x)
    sigma_sqs = softplus(sigma_pre) + sigma_LB
    thetas = softplus(theta_pre)
    log_jac = np.sum(sigma_pre - softplus(sigma_pre)) + np.sum(
        theta_pre - softplus(theta_pre)
    )
    D = X.shape[1]
    X_cent = (X - mu_ds[None, :]).T
    t1 = sum(X_cent[d] @ C_invs[d] @ X_cent[d] for d in range(D))
    f_vals = f_np(X, thetas).T
    t2 = sum(
        (f_vals[d] - m_ds[d] @ X_cent[d])
        @ K_invs[d] @ (f_vals[d] - m_ds[d] @ X_cent[d])
        for d in range(D)
    )
    t3 = np.sum(N_ds * np.log(2 * np.pi * sigma_sqs))
    Xf = X.ravel()
    t4 = np.sum((Xf[not_nan_idxs] - y_obs) ** 2 / sigma_sqs[not_nan_cols])
    return beta_temp * (-0.5 * ((t1 + t2) / beta + t3 + t4) + log_jac)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--anneal-mode", default="reference",
                    choices=["reference", "warmup_only"])
    ap.add_argument("--chains", type=int, default=1)
    ap.add_argument("--burnin", type=int, default=5000)
    ap.add_argument("--results", type=int, default=5000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or (
        "results/r_offset_validation.json"
        if args.anneal_mode == "reference"
        else "results/r_offset_validation_untempered.json"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from magi_v2_tpu import MAGI_v2, MagiConfig
    from magi_v2_tpu.models import seir_f_vec
    from magi_v2_tpu.utils.data import load_seir_csv

    ts_obs, X_obs, raw = load_seir_csv(t_max=4.0, d_obs=20)
    cfg = MagiConfig().replace(hparam_fit_points="grid")  # reference parity
    model = MAGI_v2(D_thetas=3, ts_obs=ts_obs, X_obs=X_obs, bandsize=80,
                    f_vec=seir_f_vec, config=cfg)
    t0 = time.time()
    model.initial_fit(discretization=1, verbose=True)
    print(f"initial_fit {time.time()-t0:.1f}s", flush=True)

    # --- 1. independent operator check -------------------------------
    I = model.I.reshape(-1)
    op_errs = {}
    sci_C, sci_m, sci_K = [], [], []
    for d in range(model.D):
        C_inv, m, K_inv = scipy_operators(
            I, model.phi1s[d], model.phi2s[d], model.BANDSIZE
        )
        sci_C.append(C_inv)
        sci_m.append(m)
        sci_K.append(K_inv)
        rel = lambda a, b: float(
            np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)
        )
        op_errs[f"comp{d}"] = {
            "C_inv": rel(C_inv, model.C_d_invs[d]),
            "m": rel(m, model.m_ds[d]),
            "K_inv": rel(K_inv, model.K_d_invs[d]),
        }
    print("operator rel errors:", json.dumps(op_errs), flush=True)

    # --- 2. the long scored run ---------------------------------------
    # anneal_mode='reference': permanently-tempered reference parity;
    # anneal_mode='warmup_only': anneal ramps to 1 during warmup, so the
    # scored draws sample the UNTEMPERED posterior (the meaningful
    # coverage measurement).
    t0 = time.time()
    res = model.predict(
        num_results=args.results, num_burnin_steps=args.burnin,
        num_chains=args.chains, seed=0,
        reparam="centered", anneal_mode=args.anneal_mode,
        use_annealing=True, verbose=True,
    )
    wall = time.time() - t0

    X = res["X_samps"]
    if args.chains > 1:                      # (T, C, N_I, D) -> pooled
        X = np.asarray(X).reshape(-1, model.mag_I, model.D)
    lo, hi = np.quantile(X, [0.025, 0.975], axis=0)
    idx = np.searchsorted(raw["t"], model.I.flatten())
    truth = raw["X_true"][np.clip(idx, 0, len(raw["t"]) - 1)]
    covered = (truth >= lo) & (truth <= hi)
    sig_mean = np.asarray(res["sigma_sqs_samps"]).reshape(-1, model.D).mean(
        axis=0
    )
    rmse = np.sqrt(((X.mean(axis=0) - truth) ** 2).mean(axis=0))
    offset_in_noise_sd = rmse / np.sqrt(sig_mean)
    # the offset scaled by the TRUE observation-noise sd (the sampled
    # sigma inflates under the reference's permanent tempering, which
    # makes offset_in_noise_sd look small for the wrong reason)
    idx_obs = np.clip(
        np.searchsorted(raw["t"], ts_obs), 0, len(raw["t"]) - 1
    )
    true_noise_sd = np.nanstd(
        np.asarray(X_obs) - raw["X_true"][idx_obs], axis=0
    )
    offset_in_true_noise_sd = rmse / true_noise_sd

    # --- 3. score draws with the independent stack -------------------
    samples = res["sample_results"]          # (T, C, dim) raw flat draws
    assert samples is not None
    samples = samples[:, 0, :]               # chain 0
    ND = model.mag_I * model.D
    sub = samples[:: max(1, len(samples) // 50)][:50]
    from magi_v2_tpu.posterior import make_posterior_data, make_log_posterior

    sigma_LB = (model.Xhat_init.std(axis=0) * model.config.sigma_sq_lb_scale) ** 2
    data = make_posterior_data(
        model.I, model.C_d_invs, model.m_ds, model.K_d_invs, model.mu_ds,
        model.beta, model.obs_index, sigma_LB, jnp.float64,
    )
    lp_ours = jax.jit(make_log_posterior(data, seir_f_vec))
    f_np = lambda Xv, tv: np.asarray(
        seir_f_vec(jnp.asarray(model.I), jnp.asarray(Xv), jnp.asarray(tv))
    )
    obs = model.obs_index
    lp_diffs_ops, lp_vals = [], []
    for q in sub:
        Xq = q[:ND].reshape(model.mag_I, model.D)
        sq, tq = q[ND : ND + model.D], q[ND + model.D :]
        v_ours = float(lp_ours(jnp.asarray(Xq), jnp.asarray(sq),
                               jnp.asarray(tq), 1.0))
        v_sci = transliterated_lp(
            Xq, sq, tq, 1.0, np.stack(sci_C), np.stack(sci_m),
            np.stack(sci_K), model.mu_ds, model.beta, obs.N_ds,
            obs.not_nan_idxs, obs.not_nan_cols, obs.y_observed, sigma_LB,
            f_np,
        )
        lp_vals.append(v_ours)
        lp_diffs_ops.append(v_sci - v_ours)
    lp_diffs_ops = np.asarray(lp_diffs_ops)
    lp_scale = float(np.std(lp_vals)) or 1.0

    summary = {
        "config": (
            f"SEIR vignette, centered, anneal_mode='{args.anneal_mode}', "
            f"hparam_fit_points='grid', {args.chains} chain(s), "
            f"{args.burnin}+{args.results} NUTS, CPU f64, bandsize=80, "
            f"N_I=161"
        ),
        "theta_mean": [
            round(float(v), 4)
            for v in np.asarray(res["thetas_samps"]).reshape(
                -1, model.D_thetas
            ).mean(axis=0)
        ],
        "coverage_95_per_comp": [round(float(c), 4)
                                 for c in covered.mean(axis=0)],
        "rmse_per_comp": [round(float(r), 5) for r in rmse],
        "offset_in_noise_sd": [round(float(o), 4)
                               for o in offset_in_noise_sd],
        "offset_in_true_noise_sd": [round(float(o), 4)
                                    for o in offset_in_true_noise_sd],
        "operator_rel_errors_vs_scipy": op_errs,
        "lp_independent_stack_minus_ours": {
            "mean": float(np.mean(lp_diffs_ops)),
            "max_abs": float(np.max(np.abs(lp_diffs_ops))),
            "posterior_lp_sd_for_scale": lp_scale,
        },
        "sampling_wall_s": round(wall, 1),
        "draws_scored": len(sub),
    }
    os.makedirs("results", exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
