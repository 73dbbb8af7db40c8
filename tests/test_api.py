"""End-to-end API tests on tiny configurations (CI-fast; the full vignette
golden run lives in tests/test_golden_seir.py, marked slow)."""

import numpy as np
import pytest

from magi_v2_tpu import MAGI_v2, MagiConfig
from magi_v2_tpu.models import seir_f_vec, fitzhugh_nagumo_f_vec
from magi_v2_tpu.utils.data import simulate_ode

TINY = MagiConfig().replace(hparam_num_iters=50, init_num_iters=100)


@pytest.fixture(scope="module")
def seir_data():
    return simulate_ode(
        seir_f_vec,
        x0=np.array([0.1, 0.05, 0.0]),
        thetas=np.array([6.0, 0.6, 1.8]),
        t_max=2.0,
        n_obs=21,
        noise_sd=0.005,
        substeps=20,
    )


@pytest.fixture(scope="module")
def fitted_model(seir_data):
    ts, X_obs, _ = seir_data
    model = MAGI_v2(D_thetas=3, ts_obs=ts, X_obs=X_obs, bandsize=None,
                    f_vec=seir_f_vec, config=TINY)
    model.initial_fit(discretization=1)
    return model


def test_initial_fit_populates_state(fitted_model):
    m = fitted_model
    assert m.mag_I == 41
    assert not np.any(np.isnan(m.phi1s))
    assert not np.any(np.isnan(m.phi2s))
    assert not np.any(np.isnan(m.sigma_sqs_init))
    assert not np.any(np.isnan(m.Xhat_init))
    assert m.thetas_init.shape == (3,)
    assert m.C_d_invs.shape == (3, 41, 41)
    # beta = D*N_I / sum(N_d)  (magi_v2.py:89)
    np.testing.assert_allclose(m.beta, 3 * 41 / (21 * 3))


def test_predict_results_dict_keys_match_reference(fitted_model):
    res = fitted_model.predict(num_results=20, num_burnin_steps=20, seed=0)
    # exact key parity with magi_v2.py:412-422
    for key in ["phi1s", "phi2s", "Xhat_init", "sigma_sqs_init",
                "thetas_init", "I", "X_samps", "sigma_sqs_samps",
                "thetas_samps", "kernel_results", "sample_results",
                "minutes_elapsed"]:
        assert key in res, key
    assert res["X_samps"].shape == (20, 41, 3)
    assert res["thetas_samps"].shape == (20, 3)
    assert res["sigma_sqs_samps"].shape == (20, 3)
    assert np.all(res["thetas_samps"] > 0)       # softplus range
    assert np.all(res["sigma_sqs_samps"] > 0)
    assert np.all(np.isfinite(res["X_samps"]))


def test_predict_profile_timings(fitted_model):
    res = fitted_model.predict(num_results=10, num_burnin_steps=10, seed=0,
                               profile_timings=True)
    t = res["timings"]
    for key in ["eps_init_s", "warmup_s", "sample_total_s",
                "sample_dispatch_s", "sample_stage_s", "staged_bytes",
                "sampler_total_s", "unwhiten_s", "x_fetch_s"]:
        assert key in t, key
    assert t["warmup_s"] >= 0 and t["sample_total_s"] >= 0
    # off by default, and not part of the run identity
    res2 = fitted_model.predict(num_results=10, num_burnin_steps=10, seed=0)
    assert res2["timings"] is None
    np.testing.assert_array_equal(res2["thetas_samps"],
                                  res["thetas_samps"])


def test_predict_multichain_shapes(fitted_model):
    res = fitted_model.predict(num_results=10, num_burnin_steps=10,
                               num_chains=4, seed=0, init_jitter=0.01)
    assert res["X_samps"].shape == (10, 4, 41, 3)
    assert res["thetas_samps"].shape == (10, 4, 3)


def test_bandsize_truncates_matrices(seir_data):
    ts, X_obs, _ = seir_data
    model = MAGI_v2(D_thetas=3, ts_obs=ts, X_obs=X_obs, bandsize=5,
                    f_vec=seir_f_vec, config=TINY)
    model.initial_fit(discretization=0)
    C = model.C_d_invs[0]
    i, j = np.triu_indices_from(C, k=6)
    np.testing.assert_allclose(C[i, j], 0.0)
    assert np.any(np.abs(np.triu(C, 1) - np.triu(C, 5)) > 0)
    # the truncation diagnostic records how much operator mass was dropped
    assert set(model.band_truncation) == {"C_d_invs", "K_d_invs", "m_ds"}
    assert all(0.0 <= v < 1.0 for v in model.band_truncation.values())


def test_band_truncation_warns_when_severe(seir_data):
    """A bandsize that drops >5% of the precision-operator Frobenius mass
    samples a materially different posterior (the round-4 Lorenz-1025
    adjudication: ~10% theta bias at 63% dropped mass) — users get a
    UserWarning instead of silently biased results."""
    import warnings

    ts, X_obs, _ = seir_data
    model = MAGI_v2(D_thetas=3, ts_obs=ts, X_obs=X_obs, bandsize=1,
                    f_vec=seir_f_vec, config=TINY)
    with pytest.warns(UserWarning, match="Frobenius mass"):
        model.initial_fit(discretization=0)
    assert max(model.band_truncation.values()) > 0.05

    model2 = MAGI_v2(D_thetas=3, ts_obs=ts, X_obs=X_obs, bandsize=None,
                     f_vec=seir_f_vec, config=TINY)
    model2.initial_fit(discretization=0)
    assert model2.band_truncation is None
    with warnings.catch_warnings():
        warnings.simplefilter("error")      # generous band must NOT warn
        model2.BANDSIZE = model2.mag_I - 1
        model2._apply_band_truncation()
    assert max(model2.band_truncation.values()) < 0.05


def test_update_kernel_matrices_forecast_path(fitted_model):
    m = fitted_model
    old_NI = m.mag_I
    dt = m.I[1, 0] - m.I[0, 0]
    I_new = np.arange(m.I[0, 0], m.I[-1, 0] + 5 * dt + dt / 2, dt)
    m.update_kernel_matrices(I_new, m.phi1s, m.phi2s)
    assert m.mag_I == old_NI + 5
    assert m.C_d_invs.shape == (3, m.mag_I, m.mag_I)
    np.testing.assert_allclose(m.beta, 3 * m.mag_I / m.N_ds.sum())
    # restore for other tests (module-scoped fixture)
    I_old = I_new[:old_NI]
    m.update_kernel_matrices(I_old, m.phi1s, m.phi2s)


def test_partially_observed_branch():
    ts, X_obs, _ = simulate_ode(
        fitzhugh_nagumo_f_vec,
        x0=np.array([-1.0, 1.0]),
        thetas=np.array([0.2, 0.2, 3.0]),
        t_max=5.0,
        n_obs=26,
        noise_sd=0.05,
        substeps=20,
        comp_obs=(True, False),   # R unobserved
    )
    model = MAGI_v2(D_thetas=3, ts_obs=ts, X_obs=X_obs, bandsize=None,
                    f_vec=fitzhugh_nagumo_f_vec, config=TINY)
    model.initial_fit(discretization=0)
    assert model.D_unobserved == 1
    assert not np.any(np.isnan(model.Xhat_init))
    assert not np.any(np.isnan(model.phi1s))
    res = model.predict(num_results=10, num_burnin_steps=10, seed=0)
    assert np.all(np.isfinite(res["X_samps"]))


def test_predict_asserts_on_nan_init(seir_data):
    ts, X_obs, _ = seir_data
    model = MAGI_v2(D_thetas=3, ts_obs=ts, X_obs=X_obs, bandsize=None,
                    f_vec=seir_f_vec, config=TINY)
    with pytest.raises((AssertionError, TypeError)):
        model.predict(num_results=2, num_burnin_steps=2)


def test_checkpoint_roundtrip(fitted_model, tmp_path):
    from magi_v2_tpu.utils.checkpoint import (
        load_fit, load_results, save_fit, save_results,
    )

    p = str(tmp_path / "fit.npz")
    save_fit(fitted_model, p)
    model2 = load_fit(p, seir_f_vec, config=TINY)
    np.testing.assert_allclose(model2.Xhat_init, fitted_model.Xhat_init)
    np.testing.assert_allclose(model2.C_d_invs, fitted_model.C_d_invs)
    np.testing.assert_allclose(model2.thetas_init, fitted_model.thetas_init)

    r1 = fitted_model.predict(num_results=5, num_burnin_steps=5, seed=3)
    r2 = model2.predict(num_results=5, num_burnin_steps=5, seed=3)
    np.testing.assert_allclose(r1["X_samps"], r2["X_samps"])

    rp = str(tmp_path / "res.npz")
    save_results(r1, rp)
    r1b = load_results(rp)
    np.testing.assert_allclose(r1b["X_samps"], r1["X_samps"])
    np.testing.assert_allclose(
        r1b["kernel_results"]["step_size"], r1["kernel_results"]["step_size"]
    )
    # diag metric: tail_inv_mass is None and must be OMITTED from the NPZ
    # (np.asarray(None) is an object array load_results cannot read back)
    assert r1["kernel_results"]["tail_inv_mass"] is None
    assert "tail_inv_mass" not in r1b["kernel_results"]


def test_results_roundtrip_dense_tail(fitted_model, tmp_path):
    """save/load_results with a dense(-tail) metric persists the tail block."""
    from magi_v2_tpu.utils.checkpoint import load_results, save_results

    r = fitted_model.predict(num_results=5, num_burnin_steps=5, seed=3,
                             mass_matrix="dense")
    assert r["kernel_results"]["tail_inv_mass"] is not None
    rp = str(tmp_path / "res_dense.npz")
    save_results(r, rp)
    rb = load_results(rp)
    np.testing.assert_allclose(
        rb["kernel_results"]["tail_inv_mass"],
        r["kernel_results"]["tail_inv_mass"],
    )
    np.testing.assert_allclose(rb["X_samps"], r["X_samps"])


def test_extend_for_forecast(seir_data):
    ts, X_obs, _ = seir_data
    model = MAGI_v2(D_thetas=3, ts_obs=ts, X_obs=X_obs, bandsize=None,
                    f_vec=seir_f_vec, config=TINY)
    model.initial_fit(discretization=0)
    res = model.predict(num_results=10, num_burnin_steps=10, seed=0)
    old_NI = model.mag_I
    model.extend_for_forecast(3.0, results=res)
    assert model.mag_I > old_NI
    assert model.Xhat_init.shape == (model.mag_I, 3)
    assert model.X_obs_discret.shape == (model.mag_I, 3)
    assert np.all(np.isnan(model.X_obs_discret[old_NI:]))
    res2 = model.predict(num_results=10, num_burnin_steps=10, seed=1)
    assert res2["X_samps"].shape == (10, model.mag_I, 3)
    assert np.all(np.isfinite(res2["X_samps"]))


def test_extend_for_forecast_refuses_non_uniform_grid(seir_data):
    """extend_for_forecast reuses I[1]-I[0] as THE spacing; on a
    non-uniform grid that silently fabricated a different grid (VERDICT r3
    Weak #5). Non-uniform users must extend via update_kernel_matrices."""
    ts, X_obs, _ = seir_data
    model = MAGI_v2(D_thetas=3, ts_obs=ts, X_obs=X_obs, bandsize=None,
                    f_vec=seir_f_vec, config=TINY)
    model.initial_fit(discretization=0)
    # warp the fit grid to non-uniform spacing (kernel matrices rebuilt on
    # the warped grid; the guard must fire before any state is touched)
    I_nonuniform = np.asarray(model.I[:, 0]) ** 1.5
    model.update_kernel_matrices(I_nonuniform, model.phi1s, model.phi2s)
    X_before = model.X_obs_discret.copy()
    with pytest.raises(ValueError, match="uniform fit grid"):
        model.extend_for_forecast(model.I[-1, 0] * 2.0)
    np.testing.assert_array_equal(model.X_obs_discret, X_before)


def test_mass_matrix_auto_mode(fitted_model):
    """'auto' maps to the measured-best metric for the state size: full
    dense on small states, theta tail block when sigma is pinned."""
    m = fitted_model
    full = m.mag_I * m.D + m.D + m.D_thetas
    assert m._dense_tail_size("auto", None) == full          # small state
    assert m._dense_tail_size("auto", np.full(3, 1e-4)) == m.D_thetas
    # a dense-grid state must NOT get the O(dim^2) full metric
    old = m.mag_I
    try:
        m.mag_I = 1025
        assert m._dense_tail_size("auto", None) == m.D + m.D_thetas
    finally:
        m.mag_I = old
    res = m.predict(num_results=5, num_burnin_steps=5, seed=0,
                    mass_matrix="auto")
    assert res["kernel_results"]["tail_inv_mass"].shape == (full, full)
