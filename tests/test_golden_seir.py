"""Golden acceptance test: the SEIR vignette configuration end-to-end.

The reference's de-facto acceptance test (SURVEY.md §4): run SEIR on
data/SEIR_seed=0.csv (d_obs=20, t_max=4 -> N=81, discretization=1 ->
N_I=161, bandsize=80, 1000+1000 NUTS) and compare the recovered theta to
the saved output of vignette.ipynb cell 11: beta 5.831, gamma 0.565,
sigma 1.77 (true values 6.0, 0.6, 1.8).

Marked slow: ~10 min on CPU. Run with `pytest -m slow` (deselected by
default via pyproject addopts).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

GOLDEN_THETA = np.array([5.831, 0.565, 1.77])
TRUE_THETA = np.array([6.0, 0.6, 1.8])


@pytest.fixture(scope="module")
def seir_results():
    from magi_v2_tpu import MAGI_v2
    from magi_v2_tpu.models import seir_f_vec
    from magi_v2_tpu.utils.data import load_seir_csv, simulate_ode

    try:
        ts_obs, X_obs, raw = load_seir_csv(t_max=4.0, d_obs=20)
    except (FileNotFoundError, OSError):
        ts_obs, X_obs, _ = simulate_ode(
            seir_f_vec, x0=np.array([0.1, 0.05, 0.0]),
            thetas=TRUE_THETA, t_max=4.0, n_obs=81, noise_sd=0.005,
        )
        raw = None
    model = MAGI_v2(D_thetas=3, ts_obs=ts_obs, X_obs=X_obs, bandsize=80,
                    f_vec=seir_f_vec)
    model.initial_fit(discretization=1)
    res = model.predict(num_results=1000, num_burnin_steps=1000, seed=0,
                        num_chains=2, init_jitter=0.01)
    return model, res, raw, ts_obs, X_obs


def test_theta_recovery_matches_golden(seir_results):
    _, res, _, _, _ = seir_results
    theta_mean = res["thetas_samps"].mean(axis=(0, 1))
    # within 10% of the reference's published recovery (itself ~3% off truth)
    np.testing.assert_allclose(theta_mean, GOLDEN_THETA, rtol=0.10)
    # and within 10% of the true generating parameters
    np.testing.assert_allclose(theta_mean, TRUE_THETA, rtol=0.10)


def test_sigma_recovery(seir_results):
    model, res, raw, ts_obs, X_obs = seir_results
    if raw is None:
        pytest.skip("reference CSV not available")
    idx = np.searchsorted(raw["t"], ts_obs)
    true_noise_var = ((X_obs - raw["X_true"][idx]) ** 2).mean(axis=0)
    sig_mean = res["sigma_sqs_samps"].mean(axis=(0, 1))
    # noise variance recovered within a factor of 3 (81 observations)
    assert np.all(sig_mean < 3.5 * true_noise_var)
    assert np.all(sig_mean > true_noise_var / 3.5)


def test_trajectory_credible_interval_coverage(seir_results):
    """E and I trajectories must be covered; R carries a small systematic
    offset INHERENT to the MAGI posterior on this data (measured round 2:
    R sits ~0.25 observation-noise-sd from the truth with ~1-noise-sd-wide
    CIs, identically in centered and GN-whitened coordinates — R coverage
    0.32-0.36, E/I coverage 0.96-1.0; round 1's blanket 1.0 came from the
    then-poorly-mixed sampler's conservative CI widths masking it).

    Independently validated round 3 (scripts/r_offset_validation.py,
    results/r_offset_validation.json): a fully independent operator stack
    (SciPy Bessel + finite-difference derivative matrices + np.linalg.pinv,
    no shared code) matches the library's C^{-1}/m/K^{-1} to 1e-8/1e-5/7e-4
    relative, the NumPy-transliterated reference posterior
    (magi_v2.py:308-348) evaluated through those independent operators
    matches the fused JAX lp to |diff| <= 0.19 on posterior draws (lp sd
    149), and a 5000+5000 reference-parity run reproduces an R offset of
    0.20 observation-noise-sd (covered there only because the reference's
    tempered sampling inflates the CIs) — the offset is a property of the
    MAGI posterior on this data, not an implementation artifact.

    Untempered variant (results/r_offset_validation_untempered.json,
    anneal_mode='warmup_only', 5000+5000, same independent stack): offsets
    0.32/0.39/0.35 noise-sd on E/I/R with per-comp coverage 0.90/0.89/0.99,
    independent-stack lp |diff| <= 0.017 (lp sd 14.8) — same conclusion
    without the tempering confound."""
    model, res, raw, _, _ = seir_results
    if raw is None:
        pytest.skip("reference CSV not available")
    X = res["X_samps"]
    X = X.reshape(-1, X.shape[-2], X.shape[-1])
    lo, hi = np.quantile(X, [0.025, 0.975], axis=0)
    idx = np.searchsorted(raw["t"], model.I.flatten())
    truth = raw["X_true"][np.clip(idx, 0, len(raw["t"]) - 1)]
    covered = ((truth >= lo) & (truth <= hi))
    per_comp = covered.mean(axis=0)
    assert np.all(per_comp[:2] > 0.9), per_comp
    assert covered.mean() > 0.7, per_comp
    # the R offset stays within one observation-noise sd of the truth
    rmse_R = float(np.sqrt(((X.mean(axis=0) - truth) ** 2).mean(axis=0)[2]))
    noise_sd_R = float(
        np.sqrt(((np.asarray(res["sigma_sqs_samps"]).mean(axis=(0, 1)))[2]))
    )
    assert rmse_R < noise_sd_R, (rmse_R, noise_sd_R)


def test_sirw_recovery():
    """SIRW golden test (BASELINE.json configs[3], reference
    test_magi_script.py:19-45 / sirw_test.ipynb workload): SIR with a
    random-walk time-varying transmission rate, fully observed, 5 thetas.

    Calibration run (CPU f64, 1000+1000 x 4 chains, seed 0): theta mean
    (3.974, 0.995, 0.309, 0.625, 0.200) vs truth (4, 1, 0.3, 0.5, 0.2) —
    theta[3] is weakly identified (its init clamps at ~0 and the posterior
    is wide), hence the band assertion."""
    from magi_v2_tpu import MAGI_v2
    from magi_v2_tpu.models import sirw_f_vec
    from magi_v2_tpu.utils.data import simulate_ode

    true = np.array([4.0, 1.0, 0.3, 0.5, 0.2])
    ts_obs, X_obs, _ = simulate_ode(
        sirw_f_vec, x0=np.array([0.95, 0.05, 0.0, 0.0]), thetas=true,
        t_max=8.0, n_obs=81, noise_sd=0.01,
    )
    model = MAGI_v2(5, ts_obs, X_obs, bandsize=200, f_vec=sirw_f_vec)
    model.initial_fit(discretization=1)
    res = model.predict(num_results=1000, num_burnin_steps=1000,
                        num_chains=4, seed=0, init_jitter=0.02)
    theta = res["thetas_samps"].mean(axis=(0, 1))
    np.testing.assert_allclose(theta[[0, 1, 4]], true[[0, 1, 4]], rtol=0.08)
    np.testing.assert_allclose(theta[2], true[2], rtol=0.15)
    assert 0.30 < theta[3] < 0.85


def test_fitzhugh_nagumo_recovery():
    """FN fully-observed benchmark (BASELINE.json configs[1]): theta within
    tolerance of truth under the default (warmup-only annealed) posterior."""
    from magi_v2_tpu import MAGI_v2
    from magi_v2_tpu.models import fitzhugh_nagumo_f_vec
    from magi_v2_tpu.utils.data import simulate_ode

    true = np.array([0.2, 0.2, 3.0])
    ts, X_obs, _ = simulate_ode(
        fitzhugh_nagumo_f_vec, x0=np.array([-1.0, 1.0]), thetas=true,
        t_max=20.0, n_obs=41, noise_sd=[0.2, 0.1], substeps=100,
    )
    model = MAGI_v2(D_thetas=3, ts_obs=ts, X_obs=X_obs, bandsize=None,
                    f_vec=fitzhugh_nagumo_f_vec)
    model.initial_fit(discretization=2)
    res = model.predict(num_results=1000, num_burnin_steps=1000, seed=0,
                        num_chains=4, init_jitter=0.05)
    theta = res["thetas_samps"].mean(axis=(0, 1))
    # a and c tight; b is weakly identified (generous band)
    np.testing.assert_allclose(theta[[0, 2]], true[[0, 2]], rtol=0.15)
    assert 0.0 < theta[1] < 0.45
