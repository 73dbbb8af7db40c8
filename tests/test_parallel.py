"""Chain sharding over the virtual 8-device CPU mesh (conftest pins
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np

from magi_v2_tpu.parallel import (
    chain_mesh,
    run_nuts_chains_sharded,
    shard_chain_states,
)
from magi_v2_tpu.sampler import SamplerConfig


def _logp_grad(q, beta_temp):
    return -0.5 * jnp.sum(q ** 2), -q


def test_mesh_has_eight_devices():
    mesh = chain_mesh()
    assert mesh.size == 8


def test_shard_chain_states_layout():
    mesh = chain_mesh()
    q0 = jnp.zeros((16, 5))
    q = shard_chain_states(q0, mesh)
    assert len(q.sharding.device_set) == 8
    # each device holds 2 chains x full dim
    shard_shapes = {s.data.shape for s in q.addressable_shards}
    assert shard_shapes == {(2, 5)}


def test_sharded_sampler_matches_unsharded():
    from magi_v2_tpu.sampler import run_nuts_chains

    cfg = SamplerConfig(num_results=20, num_burnin_steps=20,
                        use_annealing=False, max_tree_depth=4)
    q0 = jnp.zeros((8, 3)) + 0.5
    key = jax.random.PRNGKey(0)
    s_ref, _ = run_nuts_chains(_logp_grad, q0, key, cfg)
    s_sh, stats = run_nuts_chains_sharded(_logp_grad, q0, key, cfg)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref), atol=1e-12)
    assert np.isfinite(float(stats.step_size))


def test_sharded_rejects_uneven_chains():
    import pytest

    with pytest.raises(ValueError):
        run_nuts_chains_sharded(
            _logp_grad, jnp.zeros((6, 3)), jax.random.PRNGKey(0),
            SamplerConfig(num_results=2, num_burnin_steps=2),
        )


def test_sharded_throughput_no_pathological_overhead():
    """SPMD partitioning over the 8-device mesh must not blow up the wall
    vs the unsharded run on identical work. True multi-device speedup is
    not measurable here (CI hosts can have 1 physical core — virtual CPU
    devices share it), so this guards the overhead side only; the scaling
    table in BASELINE_MEASURED.json records the measured numbers."""
    import time

    from magi_v2_tpu.sampler import run_nuts_chains

    cfg = SamplerConfig(num_results=50, num_burnin_steps=50,
                        use_annealing=False, max_tree_depth=5)
    q0 = jnp.zeros((16, 64)) + 0.25
    key = jax.random.PRNGKey(1)
    # warm both compiles
    run_nuts_chains(_logp_grad, q0, key, cfg)
    run_nuts_chains_sharded(_logp_grad, q0, key, cfg)

    t0 = time.time()
    jax.block_until_ready(run_nuts_chains(_logp_grad, q0, key, cfg)[0])
    t_plain = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(
        run_nuts_chains_sharded(_logp_grad, q0, key, cfg)[0]
    )
    t_shard = time.time() - t0
    assert t_shard < 3.0 * t_plain + 0.5, (
        f"sharded {t_shard:.2f}s vs unsharded {t_plain:.2f}s"
    )
