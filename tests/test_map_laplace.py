"""MAP + Laplace estimation (magi_v2_tpu/map_laplace.py).

The exact-posterior point-estimate path productized from the round-4
Lorenz-1025 adjudication (results/lorenz_joint_map_probe.json): the exact
beta=1 MAGI posterior's mode recovers theta where the band-truncated
sampled posterior is biased and exact-posterior HMC is eps-collapsed.
No reference counterpart (the reference is sampling-only,
magi_v2.py:286-425)."""

import numpy as np
import pytest

from magi_v2_tpu import MAGI_v2, MagiConfig
from magi_v2_tpu.models import seir_f_vec
from magi_v2_tpu.utils.data import simulate_ode

TINY = MagiConfig().replace(hparam_num_iters=100, init_num_iters=200)
TRUE = np.array([6.0, 0.6, 1.8])


@pytest.fixture(scope="module")
def fitted():
    ts, X_obs, X_true = simulate_ode(
        seir_f_vec, x0=np.array([0.1, 0.05, 0.0]), thetas=TRUE,
        t_max=2.0, n_obs=21, noise_sd=0.005, substeps=20)
    model = MAGI_v2(D_thetas=3, ts_obs=ts, X_obs=X_obs, bandsize=None,
                    f_vec=seir_f_vec, config=TINY)
    model.initial_fit(discretization=0)
    return model, X_true


def test_map_estimate_recovers_theta_fixed_sigma(fitted):
    model, X_true = fitted
    r = model.map_estimate(sigma_sqs_fixed=0.005 ** 2)
    assert r["converged"], r["lbfgs_message"]
    assert r["grad_norm"] < 1e-3
    assert r["hessian_spd"]
    # theta within 2 Laplace sds of truth AND within 5% relative
    np.testing.assert_array_less(
        np.abs(r["theta_map"] - TRUE), 2.0 * r["theta_sd"] + 0.05 * TRUE)
    np.testing.assert_allclose(r["theta_map"], TRUE, rtol=0.05)
    # trajectory mode tracks the truth
    assert np.sqrt(((r["X_map"] - X_true) ** 2).mean()) < 0.02
    assert r["X_sd"].shape == r["X_map"].shape
    assert np.all(r["X_sd"] > 0)
    assert not r["band_truncation_bypassed"]


def test_map_estimate_free_sigma_hits_bounds_gracefully(fitted):
    """With sigma free at tiny noise the MAP drives sigma^2 to the LB
    heuristic — the projected-gradient convergence test must handle the
    active bounds (the raw L-BFGS-B gradient there is huge and
    meaningless)."""
    model, _ = fitted
    r = model.map_estimate()
    assert r["converged"] or r["grad_norm"] < 1e-2 * abs(r["neg_logpost"])
    np.testing.assert_allclose(r["theta_map"], TRUE, rtol=0.08)
    assert np.all(r["sigma_sqs_map"] > 0)


def test_map_estimate_bypasses_band_truncation():
    """On a banded model the MAP must evaluate the EXACT operators (the
    truncation is the bias being diagnosed) and say so."""
    ts, X_obs, _ = simulate_ode(
        seir_f_vec, x0=np.array([0.1, 0.05, 0.0]), thetas=TRUE,
        t_max=2.0, n_obs=21, noise_sd=0.005, substeps=20)
    model = MAGI_v2(D_thetas=3, ts_obs=ts, X_obs=X_obs, bandsize=5,
                    f_vec=seir_f_vec, config=TINY)
    model.initial_fit(discretization=0)
    r = model.map_estimate(sigma_sqs_fixed=0.005 ** 2, laplace=False)
    assert r["band_truncation_bypassed"]
    assert "theta_sd" not in r
    np.testing.assert_allclose(r["theta_map"], TRUE, rtol=0.05)


def test_gn_and_prior_preconditioning_reach_the_same_map(fitted):
    """precondition= is a pure linear coordinate change: both whitenings
    must land on the SAME MAP (theta to <=1e-3 relative, matching Laplace
    sds) — the GN factor only buys optimizer conditioning (VERDICT r4
    task 7: 27,442 prior-whitened L-BFGS-B iterations at Lorenz N_I=1025
    vs a few hundred GN-whitened)."""
    model, _ = fitted
    r_gn = model.map_estimate(sigma_sqs_fixed=0.005 ** 2)
    r_pr = model.map_estimate(sigma_sqs_fixed=0.005 ** 2,
                              precondition="prior")
    assert r_gn["precondition"] == "gn" and r_pr["precondition"] == "prior"
    np.testing.assert_allclose(r_gn["theta_map"], r_pr["theta_map"],
                               rtol=1e-3)
    np.testing.assert_allclose(r_gn["neg_logpost"], r_pr["neg_logpost"],
                               rtol=1e-6)
    np.testing.assert_allclose(r_gn["X_map"], r_pr["X_map"], atol=1e-4)
    # the Laplace pushforward agrees across coordinate systems too
    np.testing.assert_allclose(r_gn["theta_sd"], r_pr["theta_sd"], rtol=0.02)
    np.testing.assert_allclose(r_gn["X_sd"], r_pr["X_sd"], rtol=0.05,
                               atol=1e-6)


def test_laplace_draws_disperse_around_map(fitted):
    """laplace_draws must return natural-coordinate joint draws centered
    on the MAP with per-coordinate spread consistent with the Laplace
    sds (the flat-direction cap only WIDENS nothing and narrows the
    near-null directions) — the input contract of
    predict(init_states=...)."""
    model, _ = fitted
    n = 64
    r = model.map_estimate(sigma_sqs_fixed=0.005 ** 2, laplace_draws=n,
                           draws_seed=1)
    assert r["X_draws"].shape == (n, model.mag_I, model.D)
    assert r["theta_draws"].shape == (n, model.D_thetas)
    assert np.all(np.isfinite(r["X_draws"]))
    assert np.all(r["theta_draws"] >= 1e-8)
    # centered on the MAP: the draw mean is within ~4 MC standard errors
    th_mean = r["theta_draws"].mean(axis=0)
    th_se = r["theta_draws"].std(axis=0) / np.sqrt(n)
    np.testing.assert_array_less(
        np.abs(th_mean - r["theta_map"]), 4.0 * th_se + 1e-9)
    # marginal theta spread matches the Laplace sd within MC slack
    # (chi-like factor ~ +-40% at n=64)
    sd_ratio = r["theta_draws"].std(axis=0) / r["theta_sd"]
    assert np.all(sd_ratio < 1.5), sd_ratio
    # X draws disperse around X_map on the X_sd scale
    x_spread = r["X_draws"].std(axis=0)
    assert np.median(x_spread / np.maximum(r["X_sd"], 1e-12)) < 1.5
    # draws_scale shrinks the scatter proportionally
    r2 = model.map_estimate(sigma_sqs_fixed=0.005 ** 2, laplace_draws=n,
                            draws_seed=1, draws_scale=0.1)
    np.testing.assert_allclose(
        r2["theta_draws"].std(axis=0),
        0.1 * r["theta_draws"].std(axis=0), rtol=0.2)
