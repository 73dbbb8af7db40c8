"""Mid-run sampler checkpoint/resume (SamplerConfig.checkpoint_path).

The failure this guards against is real and was observed: a finished
Lorenz N_I=1025 x 256-chain TPU run was lost when the tunnel dropped
during post-sampling result fetch. With checkpointing, every dispatch
block's carry and draws are persisted, so re-running the same call
resumes bit-identically from the last completed block. No reference
counterpart (the reference has no persistence at all, magi_v2.py:412-425).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import magi_v2_tpu.sampler.run as run_mod
from magi_v2_tpu.sampler import SamplerConfig, run_nuts_chains


def _gaussian_lp(cov_inv):
    def lp(q, beta_temp):
        return -0.5 * q @ cov_inv @ q, -cov_inv @ q

    return lp


DIM, CHAINS = 3, 4


def _cfg(ckpt="", **kw):
    base = dict(
        num_results=40,
        num_burnin_steps=30,
        use_annealing=False,
        max_tree_depth=5,
        dispatch_block_steps=10,
        checkpoint_path=ckpt,
    )
    base.update(kw)
    return SamplerConfig(**base)


def _run(cfg):
    lp = _gaussian_lp(jnp.eye(DIM))
    q0 = jnp.zeros((CHAINS, DIM)) + 1.0
    return run_nuts_chains(lp, q0, jax.random.PRNGKey(7), cfg)


def test_checkpointing_does_not_change_results(tmp_path):
    samples_ref, stats_ref = _run(_cfg())
    samples_ck, stats_ck = _run(_cfg(str(tmp_path / "ck")))
    np.testing.assert_array_equal(np.asarray(samples_ref),
                                  np.asarray(samples_ck))
    np.testing.assert_array_equal(np.asarray(stats_ref.accept_probs),
                                  np.asarray(stats_ck.accept_probs))
    # state + one draws file per 10-step block
    files = sorted(os.listdir(tmp_path / "ck"))
    assert "state.npz" in files
    assert sum(f.startswith("draws_") for f in files) == 4


def test_rerun_after_completion_loads_from_disk(tmp_path, monkeypatch):
    ck = str(tmp_path / "ck")
    samples1, _ = _run(_cfg(ck))

    # a second identical call must not dispatch a single sampling block
    def boom(*a, **k):
        raise AssertionError("sampling re-dispatched on a complete checkpoint")

    monkeypatch.setattr(run_mod, "_ckpt_save_draws", boom)
    samples2, stats2 = _run(_cfg(ck))
    np.testing.assert_array_equal(np.asarray(samples1), np.asarray(samples2))
    assert np.asarray(stats2.accept_probs).shape == (40, CHAINS)


def test_crash_mid_sampling_resumes_bit_identically(tmp_path, monkeypatch):
    samples_ref, _ = _run(_cfg())

    ck = str(tmp_path / "ck")
    real_save = run_mod._ckpt_save_draws
    calls = {"n": 0}

    def crash_after_two(dirpath, start, s_blk, info):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated tunnel drop")
        real_save(dirpath, start, s_blk, info)

    monkeypatch.setattr(run_mod, "_ckpt_save_draws", crash_after_two)
    with pytest.raises(RuntimeError, match="simulated tunnel drop"):
        _run(_cfg(ck))
    monkeypatch.setattr(run_mod, "_ckpt_save_draws", real_save)

    samples, _ = _run(_cfg(ck))
    np.testing.assert_array_equal(np.asarray(samples_ref),
                                  np.asarray(samples))


def test_crash_mid_warmup_resumes_bit_identically(tmp_path, monkeypatch):
    samples_ref, _ = _run(_cfg())

    ck = str(tmp_path / "ck")
    real_save = run_mod._ckpt_save_state

    def crash_second_warmup_block(dirpath, phase, nxt, carry, fp):
        real_save(dirpath, phase, nxt, carry, fp)
        if phase == "warmup" and nxt >= 20:
            raise RuntimeError("simulated mid-warmup crash")

    monkeypatch.setattr(run_mod, "_ckpt_save_state",
                        crash_second_warmup_block)
    with pytest.raises(RuntimeError, match="mid-warmup"):
        _run(_cfg(ck))
    monkeypatch.setattr(run_mod, "_ckpt_save_state", real_save)

    samples, _ = _run(_cfg(ck))
    np.testing.assert_array_equal(np.asarray(samples_ref),
                                  np.asarray(samples))


def test_fingerprint_mismatch_rejected(tmp_path):
    ck = str(tmp_path / "ck")
    _run(_cfg(ck))
    with pytest.raises(ValueError, match="different .*run"):
        _run(_cfg(ck, num_results=50))
