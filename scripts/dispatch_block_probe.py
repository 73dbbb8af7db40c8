"""Measure dispatch-block boundary overhead on the axon TPU tunnel.

Motivation (round 4): the bench wall at the SEIR operating point is
~40-65 s for 2000+50 transitions, but pure fused-eval compute at the
microbenched 5.27M evals/s is only ~19 s — the remainder is per-dispatch
overhead through the tunnel (the auto heuristic cuts the run into
50-transition blocks = ~41 dispatches). The 50-step default was sized for
the Lorenz-1025 dense-whitening worst case, not for cheap-per-transition
configs. This probe sweeps dispatch_block_steps on the bench config and
records walls, to calibrate _auto_dispatch_block (api.py).

The tunnel constraint being respected: multi-MINUTE single dispatches are
killed (UNAVAILABLE); blocks must stay well under that.

Usage: python scripts/dispatch_block_probe.py [B ...]  (default 50 250 1000)
Writes results/dispatch_block_probe.json (merging).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.magi_jax_cache_axon"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from magi_v2_tpu import MAGI_v2, MagiConfig
    from magi_v2_tpu.models import seir_f_vec
    from magi_v2_tpu.utils import summarize_chains
    from magi_v2_tpu.utils.data import load_seir_csv

    blocks = [int(b) for b in sys.argv[1:]] or [50, 250, 1000]

    ts_obs, X_obs, _ = load_seir_csv(t_max=4.0, d_obs=20)
    cfg = MagiConfig().replace(dtype=jnp.float32)
    model = MAGI_v2(D_thetas=3, ts_obs=ts_obs, X_obs=X_obs, bandsize=80,
                    f_vec=seir_f_vec, config=cfg)
    model.initial_fit(discretization=1)

    common = dict(
        num_results=1000, num_burnin_steps=1000, num_chains=256, seed=0,
        init_jitter=0.01, algorithm="hmc", hmc_num_leapfrogs=192,
        anneal_mode="warmup_only", mass_matrix="dense",
    )
    out = {}
    for B in blocks:
        # each block size is a new scan length -> new executables; prime
        # with a short run so the timed walls are compile-free
        t0 = time.time()
        prime_kwargs = {**common, "num_results": min(50, B),
                        "num_burnin_steps": min(50, B),
                        "dispatch_block_steps": B}
        model.predict(**prime_kwargs)
        prime_s = time.time() - t0
        walls, ess = [], None
        for rep in range(2):
            t0 = time.time()
            res = model.predict(dispatch_block_steps=B, **common)
            walls.append(time.time() - t0)
            s = summarize_chains(res["thetas_samps"], walls[-1])
            ess = s
        cell = {
            "walls_s": [round(w, 2) for w in walls],
            "prime_s": round(prime_s, 2),
            "n_dispatches": int(np.ceil(1000 / B) * 2),
            "ess_min": round(ess["ess_min"], 1),
            "rhat_max": round(ess["rhat_max"], 4),
            "ess_per_sec_best": round(ess["ess_min"] / min(walls), 1),
        }
        out[f"B{B}"] = cell
        print(json.dumps({f"B{B}": cell}), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "results", "dispatch_block_probe.json")
    if os.path.exists(path):
        with open(path) as fh:
            merged = json.load(fh)
        merged.update(out)
        out = merged
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
