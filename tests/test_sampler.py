"""Sampler statistics on exactly-known targets (SURVEY.md §4: validate
HMC/NUTS on known Gaussians before wiring to MAGI)."""

import jax
import jax.numpy as jnp
import numpy as np

from magi_v2_tpu.sampler import SamplerConfig, run_nuts_chains
from magi_v2_tpu.sampler.nuts import NutsConfig, nuts_step


def _gaussian_logp_grad(cov_inv):
    def lp(q, beta_temp):
        val = -0.5 * q @ cov_inv @ q
        return val, -cov_inv @ q

    return lp


def test_nuts_step_runs_and_moves():
    dim = 4
    lp = lambda q: (-0.5 * jnp.sum(q ** 2), -q)
    q = jnp.zeros(dim) + 1.5
    q_new, info = nuts_step(lp, jax.random.PRNGKey(0), q,
                            jnp.asarray(0.5), jnp.ones(dim))
    assert q_new.shape == (dim,)
    assert np.isfinite(np.asarray(q_new)).all()
    assert 0.0 <= float(info.accept_prob) <= 1.0
    assert int(info.num_leapfrogs) >= 1
    assert not np.asarray(q_new == q).all()


def test_nuts_standard_normal_moments():
    dim = 3
    cov_inv = jnp.eye(dim)
    cfg = SamplerConfig(
        num_results=1500,
        num_burnin_steps=500,
        use_annealing=False,
        max_tree_depth=6,
    )
    C = 8
    q0 = jnp.zeros((C, dim)) + 2.0
    samples, stats = run_nuts_chains(
        _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(1), cfg
    )
    flat = np.asarray(samples).reshape(-1, dim)
    assert np.abs(flat.mean(axis=0)).max() < 0.1
    np.testing.assert_allclose(flat.var(axis=0), 1.0, atol=0.15)
    assert not np.asarray(stats.divergences).any()
    # step size adapted into a sane range for a standard normal
    assert 0.05 < float(stats.step_size) < 5.0


def test_nuts_correlated_gaussian_covariance():
    cov = np.array([[1.0, 0.7], [0.7, 2.0]])
    cov_inv = jnp.asarray(np.linalg.inv(cov))
    cfg = SamplerConfig(
        num_results=2500,
        num_burnin_steps=800,
        use_annealing=False,
        max_tree_depth=6,
    )
    C = 8
    q0 = jnp.zeros((C, 2))
    samples, _ = run_nuts_chains(
        _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(2), cfg
    )
    flat = np.asarray(samples).reshape(-1, 2)
    emp = np.cov(flat.T)
    np.testing.assert_allclose(emp, cov, atol=0.3)


def test_mass_adaptation_learns_scales():
    # badly scaled Gaussian: variances 1 and 100
    cov_inv = jnp.diag(jnp.asarray([1.0, 0.01]))
    cfg = SamplerConfig(
        num_results=500,
        num_burnin_steps=1000,
        use_annealing=False,
        adapt_mass_matrix=True,
        max_tree_depth=8,
    )
    q0 = jnp.zeros((4, 2))
    samples, stats = run_nuts_chains(
        _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(3), cfg
    )
    inv_mass = np.asarray(stats.inv_mass)
    # inverse mass should roughly match the target variances (1, 100)
    assert inv_mass[1] / inv_mass[0] > 10.0
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.var(axis=0), [1.0, 100.0], rtol=0.35)


def test_annealing_flattens_target():
    """With annealing on, early-step temperature is 1/log(2) ≈ 1.44 and
    decays below 1; sampling variance of a tempered N(0,1) at temp b is 1/b."""
    from magi_v2_tpu.sampler.run import log_temperature_schedule

    t0 = float(log_temperature_schedule(0))
    np.testing.assert_allclose(t0, 1 / np.log(2), rtol=1e-12)
    t_mid = float(log_temperature_schedule(1000))
    np.testing.assert_allclose(t_mid, 1 / np.log(1002), rtol=1e-12)
    assert float(log_temperature_schedule(10 ** 9)) == 0.1


def test_chains_are_independent_and_reproducible():
    dim = 2
    lp = _gaussian_logp_grad(jnp.eye(dim))
    cfg = SamplerConfig(num_results=50, num_burnin_steps=50,
                        use_annealing=False, max_tree_depth=5)
    q0 = jnp.zeros((3, dim))
    s1, _ = run_nuts_chains(lp, q0, jax.random.PRNGKey(7), cfg)
    s2, _ = run_nuts_chains(lp, q0, jax.random.PRNGKey(7), cfg)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    # different chains see different randomness
    assert not np.allclose(np.asarray(s1)[:, 0], np.asarray(s1)[:, 1])


def test_thinning_matches_unthinned_endpoints():
    """thin=k with T draws visits the same chain as k*T unthinned draws,
    keeping every k-th state."""
    dim = 2
    lp = _gaussian_logp_grad(jnp.eye(dim))
    q0 = jnp.zeros((2, dim))
    key = jax.random.PRNGKey(5)
    cfg_full = SamplerConfig(num_results=12, num_burnin_steps=10,
                             use_annealing=False, max_tree_depth=4)
    cfg_thin = cfg_full._replace(num_results=4, thin=3)
    s_full, _ = run_nuts_chains(lp, q0, key, cfg_full)
    s_thin, _ = run_nuts_chains(lp, q0, key, cfg_thin)
    np.testing.assert_allclose(
        np.asarray(s_thin), np.asarray(s_full)[2::3], atol=1e-12
    )


def test_dispatch_blocking_bit_identical():
    """Blocked dispatch must reproduce the single-dispatch chain exactly."""
    dim = 3
    lp = _gaussian_logp_grad(jnp.eye(dim))
    q0 = jnp.zeros((2, dim)) + 0.3
    key = jax.random.PRNGKey(9)
    cfg1 = SamplerConfig(num_results=30, num_burnin_steps=25,
                         use_annealing=False, max_tree_depth=4)
    cfg2 = cfg1._replace(dispatch_block_steps=7)
    s1, st1 = run_nuts_chains(lp, q0, key, cfg1)
    s2, st2 = run_nuts_chains(lp, q0, key, cfg2)   # device accumulation
    # host staging (stage_above_bytes=0 forces the spill path)
    s3, st3 = run_nuts_chains(lp, q0, key,
                              cfg2._replace(stage_above_bytes=0))
    assert isinstance(s3, np.ndarray)              # staged draws are host
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s3))
    np.testing.assert_array_equal(np.asarray(st1.depths), np.asarray(st2.depths))
    np.testing.assert_array_equal(np.asarray(st1.depths), np.asarray(st3.depths))
    np.testing.assert_allclose(float(st1.step_size), float(st2.step_size))
    np.testing.assert_allclose(float(st1.step_size), float(st3.step_size))


def test_hmc_standard_normal_moments():
    dim = 3
    lp = _gaussian_logp_grad(jnp.eye(dim))
    cfg = SamplerConfig(num_results=1500, num_burnin_steps=500,
                        use_annealing=False, algorithm="hmc",
                        hmc_num_leapfrogs=16)
    q0 = jnp.zeros((8, dim)) + 1.5
    samples, stats = run_nuts_chains(lp, q0, jax.random.PRNGKey(11), cfg)
    flat = np.asarray(samples).reshape(-1, dim)
    assert np.abs(flat.mean(axis=0)).max() < 0.12
    np.testing.assert_allclose(flat.var(axis=0), 1.0, atol=0.15)
    assert not np.asarray(stats.divergences).any()


def test_hmc_correlated_gaussian():
    cov = np.array([[1.0, 0.7], [0.7, 2.0]])
    cov_inv = jnp.asarray(np.linalg.inv(cov))
    cfg = SamplerConfig(num_results=2500, num_burnin_steps=800,
                        use_annealing=False, algorithm="hmc",
                        hmc_num_leapfrogs=16)
    q0 = jnp.zeros((8, 2))
    samples, _ = run_nuts_chains(_gaussian_logp_grad(cov_inv), q0,
                                 jax.random.PRNGKey(12), cfg)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.3)


def test_warmup_only_annealing_samples_true_posterior():
    """anneal_mode='warmup_only': draws match the untempered target."""
    dim = 2
    lp_tempered = lambda q, bt: (bt * (-0.5 * jnp.sum(q ** 2)), bt * (-q))
    cfg = SamplerConfig(num_results=2000, num_burnin_steps=600,
                        use_annealing=True, anneal_mode="warmup_only",
                        max_tree_depth=5)
    q0 = jnp.zeros((4, dim))
    samples, _ = run_nuts_chains(lp_tempered, q0, jax.random.PRNGKey(13), cfg)
    flat = np.asarray(samples).reshape(-1, dim)
    # variance 1.0, NOT 1/0.13 ~ 7.5 as the reference-mode tempered target
    np.testing.assert_allclose(flat.var(axis=0), 1.0, atol=0.15)


def test_warmup_only_mass_measures_beta1_posterior():
    """Warmup coherence (round-3 root cause): with annealing on, the
    Welford mass window must measure the beta=1 posterior, so the beta
    ramp ends at the window start. Measuring the FLATTENED posterior and
    sampling at beta=1 left inv_mass ~1/beta too large per coordinate
    (Lorenz N_I=1025: median 33x, max 3.5e3x -> dual averaging slashed
    eps to 1.1e-4 and froze every chain). On an anisotropic Gaussian the
    old schedule inflates the adapted inv_mass ~2x; assert it lands near
    the true variances instead."""
    var = np.array([1.0, 16.0])
    cov_inv = jnp.asarray(np.diag(1.0 / var))
    lp = lambda q, bt: (bt * (-0.5 * q @ cov_inv @ q), bt * (-(cov_inv @ q)))
    cfg = SamplerConfig(num_results=50, num_burnin_steps=600,
                        use_annealing=True, anneal_mode="warmup_only",
                        adapt_mass_matrix=True, algorithm="hmc",
                        hmc_num_leapfrogs=16)
    q0 = jnp.zeros((32, 2))
    _, stats = run_nuts_chains(lp, q0, jax.random.PRNGKey(14), cfg)
    inv_mass = np.asarray(stats.inv_mass)
    # adapted variance estimate within 40% of the beta=1 truth per dim
    np.testing.assert_allclose(inv_mass, var, rtol=0.4)
    # and the frozen step size is adapted to the beta=1 geometry
    assert 0.1 < float(stats.step_size) < 2.0


def test_two_window_mass_adaptation():
    """Stan-style staged windows (SamplerConfig.mass_window2_*): the
    second window re-estimates the metric from chains that already mix
    under the first window's metric. On a badly scaled Gaussian the final
    inv_mass must match the target variances — and come from the SECOND
    window alone (accumulators reset at each apply), which this test
    makes observable by making window 1 pathologically short/early so a
    single-window run over it estimates garbage."""
    var = np.array([1.0, 100.0])
    cov_inv = jnp.diag(jnp.asarray(1.0 / var))
    q0 = jnp.zeros((8, 2))
    # window 1 is the FIRST 10 steps, when every chain still sits near the
    # concentrated q0=0 init: its pooled estimate reflects the dispersal
    # transient, not the target
    one = SamplerConfig(num_results=200, num_burnin_steps=1000,
                        use_annealing=False, adapt_mass_matrix=True,
                        algorithm="hmc", hmc_num_leapfrogs=8,
                        mass_window_begin=0.0, mass_window_end=0.01)
    _, st1 = run_nuts_chains(
        _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(21), one
    )
    two = one._replace(mass_window2_begin=0.4, mass_window2_end=0.7)
    samples, st2 = run_nuts_chains(
        _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(21), two
    )
    im1, im2 = np.asarray(st1.inv_mass), np.asarray(st2.inv_mass)
    # the single (bad) window underestimates the wide coordinate badly;
    # the second window fixes it
    assert im1[1] < 0.5 * var[1]
    np.testing.assert_allclose(im2, var, rtol=0.5)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.var(axis=0), var, rtol=0.35)


def test_two_window_validation():
    import pytest

    lp = _gaussian_logp_grad(jnp.eye(2))
    q0 = jnp.zeros((2, 2))
    overlapping = SamplerConfig(
        num_results=10, num_burnin_steps=100, use_annealing=False,
        mass_window2_begin=0.5, mass_window2_end=0.6,  # starts inside w1
    )
    with pytest.raises(ValueError, match="start at or after"):
        run_nuts_chains(lp, q0, jax.random.PRNGKey(0), overlapping)
    too_late = SamplerConfig(
        num_results=10, num_burnin_steps=100, use_annealing=False,
        mass_window2_begin=0.7, mass_window2_end=0.9,  # past adaptation end
    )
    with pytest.raises(ValueError, match="re-adapt"):
        run_nuts_chains(lp, q0, jax.random.PRNGKey(0), too_late)
