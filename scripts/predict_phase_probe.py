"""Attribute the bench's wall-clock: where do the ~26-34 s of non-compute
overhead in a 1000+1000-step bench predict() go?

results/bench_step_probe.json showed the full sampler costs ~362 us per
leapfrog batch vs 52-67 us for bare HMC transitions, and
results/dispatch_block_probe.json showed FEWER dispatches is SLOWER
(B1000 2-dispatch 65-73 s vs B50 40-dispatch 36-54 s) — consistent with
the device->host draw transfer, not dispatch RTT, dominating. This probe
measures directly:

  rtt              trivial jitted-op dispatch round trip (median of 10)
  d2h_MBps         device->host bandwidth, 32 MB fetch (median of 5)
  h2d_MBps         host->device bandwidth, 32 MB put (median of 5)
  predict_phases   one bench-geometry predict() (tempered cell: 1000+1000,
                   L=192, dense mass, shrinkage 0.2, 256 chains) with
                   profile_timings=True: eps_init / warmup / sampling
                   dispatch / host staging / drain / unwhiten / X fetch.

A 50+50 priming predict() runs first so the timed call hits the compiled
executable cache (sample_first_dispatch_s still shows the per-call
retrace cost — the block jits are fresh closures every predict()).

Writes results/predict_phase_probe.json.
"""

import json
import os
import time

import numpy as np


def median(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--burnin", type=int, default=1000)
    ap.add_argument("--results", type=int, default=1000)
    ap.add_argument("--leapfrogs", type=int, default=192)
    ap.add_argument("--out", default="results/predict_phase_probe.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.magi_jax_cache_axon"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from magi_v2_tpu import MAGI_v2, MagiConfig
    from magi_v2_tpu.models import seir_f_vec
    from magi_v2_tpu.utils.data import load_seir_csv, simulate_ode

    out = {"device": jax.devices()[0].device_kind}

    # --- transport microbenches ------------------------------------------
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(tiny(x))
    rtts = []
    for _ in range(10):
        t0 = time.time()
        jax.block_until_ready(tiny(x))
        rtts.append(time.time() - t0)
    out["rtt_s"] = median(rtts)

    nbytes = 32 << 20
    big = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (nbytes // 4,), jnp.float32)
    )
    d2h = []
    for i in range(5):
        # fresh array each repeat: np.asarray caches the host copy on the
        # jax Array, so re-fetching the same array is free
        y = jax.block_until_ready(big + np.float32(i))
        t0 = time.time()
        np.asarray(y)
        d2h.append(time.time() - t0)
    out["d2h_MBps"] = nbytes / (1 << 20) / median(d2h)

    host = np.zeros((nbytes // 4,), np.float32)
    h2d = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(jax.device_put(host))
        h2d.append(time.time() - t0)
    out["h2d_MBps"] = nbytes / (1 << 20) / median(h2d)
    del big

    # --- bench-geometry predict with phase timings -----------------------
    try:
        ts_obs, X_obs, _ = load_seir_csv(t_max=4.0, d_obs=20)
    except (FileNotFoundError, OSError):
        ts_obs, X_obs, _ = simulate_ode(
            seir_f_vec, x0=np.array([0.1, 0.05, 0.0]),
            thetas=np.array([6.0, 0.6, 1.8]), t_max=4.0, n_obs=81,
            noise_sd=0.005,
        )
    model = MAGI_v2(D_thetas=3, ts_obs=ts_obs, X_obs=X_obs, bandsize=80,
                    f_vec=seir_f_vec,
                    config=MagiConfig().replace(dtype=jnp.float32))
    t0 = time.time()
    model.initial_fit(discretization=1, verbose=False)
    out["setup_s"] = time.time() - t0

    common = dict(
        num_chains=args.chains, seed=0, init_jitter=0.01,
        algorithm="hmc", hmc_num_leapfrogs=args.leapfrogs,
        mass_matrix="dense", anneal_mode="reference",
        dense_shrinkage=0.2, profile_timings=True,
    )
    t0 = time.time()
    model.predict(num_results=50, num_burnin_steps=50, **common)
    out["prime_s"] = time.time() - t0

    t0 = time.time()
    res = model.predict(
        num_results=args.results, num_burnin_steps=args.burnin, **common
    )
    out["predict_wall_s"] = time.time() - t0
    out["predict_phases"] = {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in res["timings"].items()
    }
    mean_L = float(res["kernel_results"]["num_leapfrogs"].mean())
    n_evals = (args.burnin + args.results) * mean_L * args.chains
    out["mean_leapfrogs"] = mean_L
    out["evals_per_sec_wall"] = n_evals / out["predict_wall_s"]
    # what the throughput would be if only dispatch+drain walls counted
    t_dev = (res["timings"].get("warmup_s", 0.0)
             + res["timings"].get("sample_total_s", 0.0))
    out["evals_per_sec_device_phases"] = n_evals / t_dev if t_dev else None

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
