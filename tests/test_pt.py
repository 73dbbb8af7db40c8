"""Parallel tempering (replica exchange) on exactly-known targets.

The PT machinery (SamplerConfig.pt_betas, run.py) is validated the same
way the base kernels are (SURVEY.md §4): on analytic targets first. The
acceptance criterion is the one PT exists for — a bimodal target whose
barrier plain HMC cannot cross at beta=1 gets BOTH modes with correct
weights from the beta=1 rung once hot rungs ferry crossings down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magi_v2_tpu.sampler import SamplerConfig, run_nuts_chains

MODE = 3.0
SD = 0.35


def _bimodal_logp_grad(weight_right=0.5):
    """log p(q) = log-mixture of N(±MODE, SD²) in coord 0, N(0,1) in
    coord 1. Barrier height ~ (MODE/SD)²/2 ≈ 37 nats at beta=1."""
    w_r = weight_right

    def log_dens(q):
        z = q[0]
        la = jnp.log1p(-w_r) - 0.5 * ((z + MODE) / SD) ** 2
        lb = jnp.log(w_r) - 0.5 * ((z - MODE) / SD) ** 2
        return jnp.logaddexp(la, lb) - 0.5 * q[1] ** 2

    def lp(q, beta_temp):
        val, grad = jax.value_and_grad(log_dens)(q)
        return beta_temp * val, beta_temp * grad

    return lp


def _cfg(**kw):
    base = dict(
        num_results=1500,
        num_burnin_steps=600,
        use_annealing=False,
        algorithm="hmc",
        hmc_num_leapfrogs=24,
        adapt_mass_matrix=False,
    )
    base.update(kw)
    return SamplerConfig(**base)


def _run(cfg, C, seed=0):
    q0 = jnp.zeros((C, 2)).at[:, 0].add(-MODE)   # every chain in the LEFT mode
    return run_nuts_chains(
        _bimodal_logp_grad(), q0, jax.random.PRNGKey(seed), cfg
    )


def test_plain_hmc_stays_in_start_mode():
    # the negative control: beta=1 chains never cross the ~37-nat barrier
    samples, _ = _run(_cfg(), C=8)
    z = np.asarray(samples)[..., 0].ravel()
    assert (z < 0).all()


def test_pt_recovers_both_modes_with_correct_weights():
    R, M = 4, 8
    cfg = _cfg(pt_betas=(1.0, 0.3, 0.1, 0.03), num_results=3000)
    samples, stats = _run(cfg, C=R * M)
    # run-level output carries ALL rungs (api.predict slices); rung-major
    z_cold = np.asarray(samples)[:, :M, 0].ravel()
    frac_right = float((z_cold > 0).mean())
    assert 0.3 < frac_right < 0.7, frac_right          # both modes, ~50/50
    # swap diagnostics: (R-1,) acceptance rates, all pairs actually mixing
    acc = np.asarray(stats.pt_swap_accept)
    assert acc.shape == (R - 1,)
    assert ((acc > 0.05) & (acc <= 1.0)).all(), acc


def test_pt_respects_mixture_weights_asymmetric():
    R, M = 4, 8
    cfg = _cfg(pt_betas=(1.0, 0.3, 0.1, 0.03), num_results=3000)
    q0 = jnp.zeros((R * M, 2)).at[:, 0].add(-MODE)
    samples, _ = run_nuts_chains(
        _bimodal_logp_grad(weight_right=0.8), q0,
        jax.random.PRNGKey(3), cfg,
    )
    z_cold = np.asarray(samples)[:, :M, 0].ravel()
    frac_right = float((z_cold > 0).mean())
    assert 0.6 < frac_right < 0.95, frac_right


def test_pt_swap_every_reduces_proposals():
    R, M = 2, 4
    cfg = _cfg(pt_betas=(1.0, 0.5), pt_swap_every=5, num_results=1000)
    _, stats = _run(cfg, C=R * M)
    assert stats.pt_swap_accept is not None
    # no direct proposal count in stats; the rate must still be a rate
    acc = float(np.asarray(stats.pt_swap_accept)[0])
    assert 0.0 <= acc <= 1.0


@pytest.mark.parametrize(
    "betas,err",
    [
        ((0.9, 0.5), "start at 1.0"),
        ((1.0, 1.0), "strictly decreasing"),
        ((1.0, 0.5, 0.7), "strictly decreasing"),
        ((1.0, 0.0), "strictly decreasing"),
    ],
)
def test_pt_ladder_validation(betas, err):
    with pytest.raises(ValueError, match=err):
        _run(_cfg(pt_betas=betas, num_results=10, num_burnin_steps=10), C=8)


def test_pt_chain_divisibility_and_reference_mode_rejected():
    with pytest.raises(ValueError, match="divide"):
        _run(_cfg(pt_betas=(1.0, 0.5, 0.25), num_results=10,
                  num_burnin_steps=10), C=8)
    with pytest.raises(ValueError, match="fixed beta=1"):
        _run(_cfg(pt_betas=(1.0, 0.5), use_annealing=True,
                  anneal_mode="reference", num_results=10,
                  num_burnin_steps=10), C=8)


def test_pt_single_rung_is_noop_ladder():
    # R=1 ladders disable PT entirely: identical to the plain path
    s_plain, _ = _run(_cfg(num_results=50, num_burnin_steps=50), C=4)
    s_r1, _ = _run(_cfg(num_results=50, num_burnin_steps=50,
                        pt_betas=(1.0,)), C=4)
    np.testing.assert_array_equal(np.asarray(s_plain), np.asarray(s_r1))
