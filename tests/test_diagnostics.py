"""ESS / R-hat / profiling utilities."""

import numpy as np

from magi_v2_tpu.utils import (
    PhaseTimer,
    effective_sample_size,
    potential_scale_reduction,
    sampler_report,
    summarize_chains,
)


def test_ess_iid_close_to_n():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4000, 4))
    ess = effective_sample_size(x)
    assert 0.7 * 16000 < ess <= 16000


def test_ess_ar1_reduced():
    rng = np.random.default_rng(1)
    T, C = 4000, 4
    rho = 0.9
    x = np.zeros((T, C))
    eps = rng.standard_normal((T, C))
    for t in range(1, T):
        x[t] = rho * x[t - 1] + np.sqrt(1 - rho ** 2) * eps[t]
    ess = effective_sample_size(x)
    # AR(1) ESS factor = (1-rho)/(1+rho) ~ 0.0526
    expected = T * C * (1 - rho) / (1 + rho)
    assert 0.4 * expected < ess < 2.5 * expected


def test_rhat_mixed_vs_unmixed():
    rng = np.random.default_rng(2)
    mixed = rng.standard_normal((2000, 4))
    assert potential_scale_reduction(mixed) < 1.01
    unmixed = mixed + np.array([0.0, 1.0, 2.0, 3.0])
    assert potential_scale_reduction(unmixed) > 1.5


def test_summarize_chains_keys():
    rng = np.random.default_rng(3)
    s = summarize_chains(rng.standard_normal((500, 2, 3)), wall_seconds=10.0)
    for k in ["ess_min", "ess_mean", "rhat_max", "ess_per_sec_min"]:
        assert k in s
    assert s["ess_min"] <= s["ess_mean"]


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert set(rep) == {"a", "b", "total_s"}


def test_sampler_report_structure():
    rng = np.random.default_rng(4)
    results = {
        "thetas_samps": rng.standard_normal((200, 3)) ** 2,
        "kernel_results": {
            "step_size": np.asarray(0.1),
            "accept_probs": rng.uniform(0.6, 0.9, (200, 1)),
            "divergences": np.zeros((200, 1), bool),
            "depths": np.full((200, 1), 5),
            "num_leapfrogs": np.full((200, 1), 31),
        },
    }
    rep = sampler_report(results, wall_seconds=5.0)
    assert rep["divergence_rate"] == 0.0
    assert rep["mean_tree_depth"] == 5.0
    assert "ess_min" in rep and "ess_per_sec_min" in rep
