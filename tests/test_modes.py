"""Direct unit tests for the extracted sampler mode builders
(magi_v2_tpu/sampler/modes.py) — the reparam x storage logp-grad
constructions predict() dispatches to, and the known-sigma pinning that
must survive a Gauss-Newton re-anchor rebuild (the round-2 advisor
finding: the pinning wrapper was applied OUTSIDE the builder and silently
dropped by precond_refresh_steps)."""

import jax.numpy as jnp
import numpy as np
import pytest

from magi_v2_tpu.ops.linalg import sym_sqrt
from magi_v2_tpu.posterior import make_posterior_data, to_banded_data
from magi_v2_tpu.sampler.magi_state import flatten_state
from magi_v2_tpu.sampler.modes import build_sampling_mode


@pytest.fixture(scope="module")
def small_seir_model():
    from magi_v2_tpu import MAGI_v2, MagiConfig
    from magi_v2_tpu.models import seir_f_vec
    from magi_v2_tpu.utils.data import simulate_ode

    ts, X, _ = simulate_ode(
        seir_f_vec,
        x0=np.array([0.1, 0.05, 0.0]),
        thetas=np.array([6.0, 0.6, 1.8]),
        t_max=2.0,
        n_obs=21,
        noise_sd=0.005,
    )
    cfg = MagiConfig().replace(hparam_num_iters=200, init_num_iters=500)
    model = MAGI_v2(3, ts, X, bandsize=20, f_vec=seir_f_vec, config=cfg)
    model.initial_fit(discretization=1)
    return model


def _make_data(m, dtype, banded=False):
    sigma_LB = np.full(m.D, 1e-6)
    R64 = np.asarray(sym_sqrt(jnp.asarray(m.C_d_invs)))
    S64 = np.asarray(sym_sqrt(jnp.asarray(m.K_d_invs)))
    data = make_posterior_data(
        m.I, m.C_d_invs, m.m_ds, m.K_d_invs, m.mu_ds, m.beta,
        m.obs_index, sigma_LB, dtype,
        C_inv_sqrts=None if banded else R64,
        K_inv_sqrts=None if banded else S64,
    )
    if banded:
        data = to_banded_data(
            data, m.BANDSIZE, C_inv_sqrts_f64=R64, K_inv_sqrts_f64=S64
        )
    return data, R64, S64


def test_dense_modes_agree_on_differences(small_seir_model):
    """centered / whitened / dense-GN modes built by build_sampling_mode
    must evaluate the same tempered log-posterior up to a mode-constant
    shift (the GN mode works in relative energies around a reference
    point) — differences between two states must agree exactly across
    modes, since the coordinate changes are linear with constant
    Jacobian."""
    m = small_seir_model
    dtype = jnp.float64
    data, R64, S64 = _make_data(m, dtype)

    sig1 = jnp.asarray(np.full(m.D, -2.0), dtype)
    sig2 = jnp.asarray(np.full(m.D, -1.0), dtype)
    th1 = jnp.asarray(np.full(m.D_thetas, 0.5), dtype)
    th2 = jnp.asarray(np.full(m.D_thetas, 0.8), dtype)
    bt = jnp.asarray(0.8, dtype)

    diffs = {}
    for reparam in ("centered", "whitened", "precond"):
        mode = build_sampling_mode(m, data, reparam, "dense", dtype, R64, S64)
        v1, g1 = mode.logp_grad(flatten_state(mode.X0, sig1, th1), bt)
        v2, g2 = mode.logp_grad(flatten_state(mode.X0, sig2, th2), bt)
        assert np.all(np.isfinite(np.asarray(g1))), reparam
        assert np.all(np.isfinite(np.asarray(g2))), reparam
        diffs[reparam] = float(v2) - float(v1)
    ref = diffs["centered"]
    for reparam, dv in diffs.items():
        np.testing.assert_allclose(dv, ref, rtol=1e-6, err_msg=reparam)


def test_unwhiten_draws_roundtrip(small_seir_model):
    """unwhiten_draws(X0-as-draws) must reproduce the init trajectories."""
    from magi_v2_tpu.sampler.modes import unwhiten_draws

    m = small_seir_model
    dtype = jnp.float64
    for reparam, storage, banded in [
        ("precond", "dense", False),
        ("whitened", "dense", False),
        ("precond", "banded", True),
    ]:
        data, R64, S64 = _make_data(m, dtype, banded=banded)
        mode = build_sampling_mode(m, data, reparam, storage, dtype, R64, S64)
        Z = jnp.asarray(mode.X0)[None, None]            # (T=1, C=1, N, D)
        X = unwhiten_draws(mode, Z, data.mu_ds, 1, dtype)
        np.testing.assert_allclose(
            np.asarray(X)[0, 0], m.Xhat_init, atol=1e-6,
            err_msg=f"{reparam}/{storage}",
        )


def test_unwhiten_draws_device_and_host_paths_agree(small_seir_model):
    """The device-resident fast path (draws kept on device, run.py
    stage_above_bytes) and the host-staged chunk path must produce the
    same trajectories, and the device path must not pull the result to
    host."""
    import jax

    from magi_v2_tpu.sampler.modes import unwhiten_draws

    m = small_seir_model
    dtype = jnp.float64
    data, R64, S64 = _make_data(m, dtype, banded=False)
    mode = build_sampling_mode(m, data, "precond", "dense", dtype, R64, S64)
    rng = np.random.default_rng(0)
    Z_np = rng.normal(size=(3, 2, m.mag_I, m.D))
    X_dev = unwhiten_draws(mode, jnp.asarray(Z_np, dtype), data.mu_ds, 2,
                           dtype)
    X_host = unwhiten_draws(mode, np.asarray(Z_np), data.mu_ds, 2, dtype)
    assert isinstance(X_dev, jax.Array)
    assert isinstance(X_host, np.ndarray)
    np.testing.assert_allclose(np.asarray(X_dev), X_host, rtol=1e-9)


def test_sigma_pinning_survives_gn_rebuild(small_seir_model):
    """REGRESSION (round-2 advisor, severity medium): rebuilding the banded
    GN mode at a new anchor (precond_refresh_steps) must re-apply the
    sigma-pinning wrapper — the rebuilt target must be flat in the
    sigma_pre block."""
    m = small_seir_model
    dtype = jnp.float64
    data, R64, S64 = _make_data(m, dtype, banded=True)
    sig_pre_fix = np.full(m.D, -1.5)
    mode = build_sampling_mode(
        m, data, "precond", "banded", dtype, R64, S64,
        sig_pre_fix=sig_pre_fix,
    )
    # rebuild at a perturbed anchor, as refresh_gn_anchor would
    rng = np.random.default_rng(0)
    anchor_X = m.Xhat_init + 0.05 * rng.standard_normal(m.Xhat_init.shape)
    anchor_th = np.asarray(m.thetas_init) * 1.1
    mode2 = mode.rebuild(anchor_X, anchor_th)

    th = jnp.asarray(np.full(m.D_thetas, 0.5), dtype)
    bt = jnp.asarray(1.0, dtype)
    lo = m.mag_I * m.D
    for md in (mode, mode2):
        q_a = flatten_state(
            jnp.asarray(md.X0), jnp.asarray(np.full(m.D, -1.5), dtype), th
        )
        q_b = flatten_state(
            jnp.asarray(md.X0), jnp.asarray(np.full(m.D, 3.0), dtype), th
        )
        v_a, g_a = md.logp_grad(q_a, bt)
        v_b, g_b = md.logp_grad(q_b, bt)
        # pinned: value insensitive to the sigma_pre block, grad zero there
        np.testing.assert_allclose(float(v_a), float(v_b), rtol=0, atol=0)
        assert np.all(np.asarray(g_a)[lo : lo + m.D] == 0.0)
        assert np.all(np.asarray(g_b)[lo : lo + m.D] == 0.0)


def test_sigma_fixed_validation(small_seir_model):
    """sigma_sqs_fixed must be finite and > 0 (the round-2 advisor's
    -inf pre-image finding)."""
    m = small_seir_model
    for bad in (0.0, -1.0, np.nan):
        with pytest.raises(ValueError, match="sigma_sqs_fixed"):
            m.predict(
                num_results=2, num_burnin_steps=2, sigma_sqs_fixed=bad
            )


def test_fixed_sigma_with_refresh_end_to_end(small_seir_model):
    """The combination the round-2 advisor flagged: sigma_sqs_fixed +
    precond_refresh_steps. The reported sigma draws must be the fixed
    values, and theta must stay sane."""
    fixed = 0.01
    res = small_seir_model.predict(
        num_results=20,
        num_burnin_steps=20,
        num_chains=2,
        seed=0,
        storage="banded",
        reparam="precond",
        sigma_sqs_fixed=fixed,
        precond_refresh_steps=10,
    )
    assert np.all(res["sigma_sqs_samps"] == fixed)
    th = res["thetas_samps"].reshape(-1, 3)
    assert np.all(np.isfinite(th))
