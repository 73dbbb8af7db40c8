"""Dense(-tail) mass matrix: operator oracles + sampler statistics.

The mass abstraction (sampler/mass.py) must (a) reduce exactly to the
diagonal path when no tail block is configured, (b) implement M^{-1}p /
kinetic / momentum-sampling consistently with the explicit dense matrices,
and (c) actually fix the geometry it exists for: a strongly correlated
Gaussian that a diagonal metric cannot decorrelate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magi_v2_tpu.sampler import SamplerConfig, run_nuts_chains
from magi_v2_tpu.sampler.mass import (
    TailDenseMass,
    identity_mass,
    mass_diag,
    mass_from_moments,
    mass_kinetic,
    mass_sample_momentum,
    mass_tail_inv,
    mass_vel,
)


def _random_spd(k, seed, cond=50.0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(k, k)))
    evals = np.geomspace(1.0, cond, k)
    return (Q * evals) @ Q.T


def test_identity_mass_plain_for_zero_tail():
    m = identity_mass(7, 0, jnp.float32)
    assert not isinstance(m, TailDenseMass)
    np.testing.assert_array_equal(np.asarray(m), np.ones(7, np.float32))
    assert mass_tail_inv(m) is None


def test_mass_ops_match_explicit_dense():
    dim, k = 9, 4
    var = np.abs(np.random.default_rng(0).normal(size=dim)) + 0.5
    tail_cov = _random_spd(k, 1)
    m = mass_from_moments(jnp.asarray(var), jnp.asarray(tail_cov))

    # the full inverse-mass matrix the abstraction implements
    Minv = np.diag(var.copy())
    Minv[-k:, -k:] = tail_cov
    M = np.linalg.inv(Minv)

    p = np.random.default_rng(2).normal(size=dim)
    np.testing.assert_allclose(
        np.asarray(mass_vel(m, jnp.asarray(p))), Minv @ p, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(mass_kinetic(m, jnp.asarray(p))), 0.5 * p @ Minv @ p, rtol=1e-5
    )
    # reported diagonal: head variances + tail marginals
    d = np.asarray(mass_diag(m))
    np.testing.assert_allclose(d[:-k], var[:-k], rtol=1e-6)
    np.testing.assert_allclose(d[-k:], np.diag(tail_cov), rtol=1e-6)

    # momentum samples distribute as N(0, M): check sample covariance
    keys = jax.random.PRNGKey(3)
    ps = mass_sample_momentum(m, keys, (200_000, dim), jnp.float32)
    emp = np.cov(np.asarray(ps), rowvar=False)
    np.testing.assert_allclose(emp, M, atol=0.03 * np.abs(M).max())


def test_mass_vel_broadcasts_over_leading_axes():
    dim, k = 6, 3
    m = mass_from_moments(
        jnp.ones(dim), jnp.asarray(_random_spd(k, 4), jnp.float32)
    )
    P = jnp.asarray(np.random.default_rng(5).normal(size=(10, dim)),
                    jnp.float32)
    batched = np.asarray(mass_vel(m, P))
    rows = np.stack([np.asarray(mass_vel(m, P[i])) for i in range(10)])
    np.testing.assert_allclose(batched, rows, rtol=1e-6)


def test_full_dense_mass_covers_whole_state():
    dim = 5
    cov = _random_spd(dim, 6)
    m = mass_from_moments(jnp.asarray(cov.diagonal()), jnp.asarray(cov))
    p = np.random.default_rng(7).normal(size=dim)
    np.testing.assert_allclose(
        np.asarray(mass_vel(m, jnp.asarray(p))), cov @ p, rtol=1e-5
    )


def _gaussian_logp_grad(cov_inv):
    def lp(q, beta_temp):
        g = -cov_inv @ q
        return 0.5 * q @ g, g

    return lp


@pytest.mark.parametrize("algorithm", ["hmc", "nuts"])
def test_dense_tail_mass_decorrelates_ridge(algorithm):
    """3-dim Gaussian with a rho=0.99 ridge in the last two coordinates:
    the diagonal metric leaves condition number ~200; the dense tail block
    must recover the true covariance with short trajectories."""
    rho = 0.99
    cov = np.array([
        [1.0, 0.0, 0.0],
        [0.0, 1.0, rho],
        [0.0, rho, 1.0],
    ])
    cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    cfg = SamplerConfig(
        num_results=1500,
        num_burnin_steps=1000,
        use_annealing=False,
        algorithm=algorithm,
        hmc_num_leapfrogs=8,       # deliberately short trajectories
        max_tree_depth=4,
        dense_tail_size=2,
    )
    C = 16
    q0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(C, 3)), jnp.float32
    )
    samples, stats = run_nuts_chains(
        _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(2), cfg
    )
    # the adapted tail block must have learned the ridge
    tail = np.asarray(stats.tail_inv_mass)
    assert tail is not None and tail.shape == (2, 2)
    learned_rho = tail[0, 1] / np.sqrt(tail[0, 0] * tail[1, 1])
    assert learned_rho > 0.9, learned_rho

    flat = np.asarray(samples).reshape(-1, 3)
    emp = np.cov(flat, rowvar=False)
    np.testing.assert_allclose(emp, cov, atol=0.15)
    assert np.abs(flat.mean(axis=0)).max() < 0.15


def test_dense_tail_beats_diag_ess_on_ridge():
    """Same ridge target: effective sample size of the slow (anti-ridge)
    direction must improve materially with the dense tail metric at equal
    trajectory length."""
    from magi_v2_tpu.utils.diagnostics import effective_sample_size

    rho = 0.99
    cov = np.array([[1.0, rho], [rho, 1.0]])
    cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    C = 8
    q0 = jnp.asarray(np.random.default_rng(1).normal(size=(C, 2)),
                     jnp.float32)

    def run(tail):
        cfg = SamplerConfig(
            num_results=1000,
            num_burnin_steps=800,
            use_annealing=False,
            algorithm="hmc",
            hmc_num_leapfrogs=4,
            dense_tail_size=tail,
        )
        samples, _ = run_nuts_chains(
            _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(3), cfg
        )
        # slow direction of the ridge is (1, 1)/sqrt(2)
        slow = np.asarray(samples) @ (np.ones(2) / np.sqrt(2.0))
        return effective_sample_size(slow)   # (T, C) -> pooled scalar

    ess_diag = run(0)
    ess_dense = run(2)
    assert ess_dense > 2.0 * ess_diag, (ess_diag, ess_dense)


def test_dense_tail_checkpoint_resume_bit_identical(tmp_path):
    """The TailDenseMass pytree must round-trip through the sampler
    checkpoint (run.py serializes carry leaves positionally)."""
    cov_inv = jnp.asarray(np.linalg.inv(
        np.array([[1.0, 0.8], [0.8, 1.5]])), jnp.float32)
    q0 = jnp.asarray(np.random.default_rng(2).normal(size=(4, 2)),
                     jnp.float32)
    kw = dict(
        num_results=60, num_burnin_steps=40, use_annealing=False,
        algorithm="hmc", hmc_num_leapfrogs=4, dense_tail_size=2,
        dispatch_block_steps=25,
    )
    ref, _ = run_nuts_chains(
        _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(5),
        SamplerConfig(**kw),
    )
    ck = str(tmp_path / "ck")
    cfg = SamplerConfig(**kw, checkpoint_path=ck)
    # first pass populates the checkpoint; second pass resumes from the
    # completed state and must replay the identical draws
    first, _ = run_nuts_chains(
        _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(5), cfg
    )
    resumed, _ = run_nuts_chains(
        _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(5), cfg
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(first))
    np.testing.assert_array_equal(np.asarray(first), np.asarray(resumed))


def test_dense_shrinkage_semantics():
    """dense_shrinkage: 0.0 is bit-identical to the default estimator;
    1.0 zeroes the learned correlations (diagonal tail block); partial
    values interpolate the off-diagonals and keep marginals untouched."""
    from magi_v2_tpu.sampler.run import (
        _welford_cov_add_batch, _welford_cov_init, _welford_covariance,
    )

    w = _welford_cov_init(2, jnp.float32)
    xs = jnp.asarray(
        np.random.default_rng(0).multivariate_normal(
            [0.0, 0.0], [[1.0, 0.95], [0.95, 1.0]], size=4000
        ),
        jnp.float32,
    )
    w = _welford_cov_add_batch(w, xs)
    base = np.asarray(_welford_covariance(w))
    np.testing.assert_array_equal(
        np.asarray(_welford_covariance(w, 0.0)), base
    )
    half = np.asarray(_welford_covariance(w, 0.5))
    np.testing.assert_allclose(np.diag(half), np.diag(base), rtol=1e-6)
    np.testing.assert_allclose(half[0, 1], 0.5 * base[0, 1], rtol=1e-6)
    full = np.asarray(_welford_covariance(w, 1.0))
    assert full[0, 1] == 0.0 and full[1, 0] == 0.0
    np.testing.assert_allclose(np.diag(full), np.diag(base), rtol=1e-6)


def test_dense_shrinkage_end_to_end_zeroes_tail_correlation():
    """Full shrinkage through the sampler: the adapted tail block is
    diagonal, so dynamics reduce to the diag metric on the ridge target."""
    rho = 0.99
    cov = np.array([
        [1.0, 0.0, 0.0],
        [0.0, 1.0, rho],
        [0.0, rho, 1.0],
    ])
    cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    cfg = SamplerConfig(
        num_results=50,
        num_burnin_steps=400,
        use_annealing=False,
        algorithm="hmc",
        hmc_num_leapfrogs=8,
        dense_tail_size=2,
        dense_shrinkage=1.0,
    )
    q0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 3)), jnp.float32
    )
    _, stats = run_nuts_chains(
        _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(2), cfg
    )
    tail = np.asarray(stats.tail_inv_mass)
    assert tail[0, 1] == 0.0 and tail[1, 0] == 0.0
    assert np.all(np.diag(tail) > 0.0)


def test_two_window_diag_first_dense_tail():
    """mass_window1_diag: with two windows and a dense tail, the FIRST
    window applies per-coordinate scales only (robust) and the second
    supplies the dense correlations — the staging that killed the
    tempered bench's worst-seed ESS tail (results/
    seir_seed_sweep_2win_diag1.json, all 10 seeds 120k-131k ESS_min).
    On the rho=0.99 ridge the final tail block must still learn the
    ridge (from window 2), and sampling must recover the covariance."""
    rho = 0.99
    cov = np.array([
        [1.0, 0.0, 0.0],
        [0.0, 1.0, rho],
        [0.0, rho, 1.0],
    ])
    cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    cfg = SamplerConfig(
        num_results=1500,
        num_burnin_steps=1000,
        use_annealing=False,
        algorithm="hmc",
        hmc_num_leapfrogs=8,
        dense_tail_size=2,
        mass_window_begin=0.25, mass_window_end=0.45,
        mass_window2_begin=0.50, mass_window2_end=0.72,
        mass_window1_diag=True,
    )
    q0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 3)), jnp.float32
    )
    samples, stats = run_nuts_chains(
        _gaussian_logp_grad(cov_inv), q0, jax.random.PRNGKey(2), cfg
    )
    tail = np.asarray(stats.tail_inv_mass)
    learned_rho = tail[0, 1] / np.sqrt(tail[0, 0] * tail[1, 1])
    assert learned_rho > 0.9, learned_rho
    flat = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(
        np.cov(flat, rowvar=False), cov, atol=0.15
    )
