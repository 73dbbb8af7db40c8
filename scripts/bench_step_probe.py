"""Decompose the bench's per-leapfrog cost: where does the 6x gap between
the microbenched fused eval (5.27M evals/s/chip) and the sampler-derived
throughput (~0.9-1.1M evals/s) go?

Components timed at the EXACT bench geometry (SEIR N_obs=81, disc=1 ->
N_I=161, D=4, dim=651, 256 chains, f32, matmul precision "highest",
storage='dense', reparam='precond', full dense inverse-mass metric):

  eval            scan of fused logp+grad evals (bench._microbench_fused_eval
                  replica) — the reported numerator.
  eval_mass       eval + dense mass_vel matvec per iteration — the leapfrog's
                  flops without its control flow.
  leapfrog_scan   the true leapfrog body (p-half/q/p updates) in a lax.scan —
                  what the while_loop costs WOULD be if lengths were static.
  hmc_fixed       full make_hmc_step transitions (while_loop, momentum
                  sampling, accept) at traced L=192 — adds while_loop + per
                  -transition overhead.
  hmc_jitter      same with the sampler's shared jittered length (mean ~L/2):
                  checks cost tracks the EXECUTED length, not the bound.
  sampler_block   run_nuts_chains (adaptation off, fixed eps/mass) in one
                  on-device dispatch vs 50-step dispatch blocks with host
                  staging — isolates the dispatch/tunnel/staging tax.

Each cell runs inside ONE jit (scan) so axon per-dispatch latency is
amortized identically to the real sampler's blocks; walls are medians of 3.

Writes results/bench_step_probe.json.
"""

import json
import os
import time

import numpy as np


def median_wall(fn, repeats=3):
    import jax

    jax.block_until_ready(fn())  # compile
    walls = []
    for _ in range(repeats):
        t0 = time.time()
        jax.block_until_ready(fn())
        walls.append(time.time() - t0)
    return sorted(walls)[len(walls) // 2]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--evals", type=int, default=2000,
                    help="scan length for the eval-level cells")
    ap.add_argument("--transitions", type=int, default=10,
                    help="scan length for the transition-level cells")
    ap.add_argument("--leapfrogs", type=int, default=192)
    ap.add_argument("--block-steps", type=int, default=100,
                    help="total steps for the sampler_block cells")
    ap.add_argument("--out", default="results/bench_step_probe.json")
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
    from magi_v2_tpu.sampler import SamplerConfig, run_nuts_chains
    from magi_v2_tpu.sampler.hmc import make_hmc_step
    from magi_v2_tpu.sampler.magi_state import flatten_state
    from magi_v2_tpu.sampler.mass import (
        TailDenseMass,
        mass_sample_momentum,
        mass_vel,
    )
    from magi_v2_tpu.utils.data import load_seir_csv, simulate_ode

    dtype = jnp.float32
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
                    config=MagiConfig().replace(dtype=dtype))
    model.initial_fit(discretization=1, verbose=False)

    mode, *_ = model._build_sampling_setup("precond", "dense", dtype)
    logp_grad = mode.logp_grad
    q0 = flatten_state(mode.X0, jnp.zeros((model.D,), dtype),
                       jnp.zeros((model.D_thetas,), dtype))
    dim = q0.shape[0]
    C = args.chains
    q = jnp.broadcast_to(q0, (C, dim))
    one = jnp.asarray(1.0, dtype)
    L = args.leapfrogs

    # full-state dense metric like the bench's adapted one (values don't
    # matter for timing; shape/structure do)
    rng = np.random.default_rng(0)
    A = rng.normal(size=(dim, dim)) * 0.01
    tail_inv = jnp.asarray(np.eye(dim) + A @ A.T, dtype)
    tail_msqrt = jnp.asarray(
        np.linalg.cholesky(np.linalg.inv(np.eye(dim) + A @ A.T)), dtype)
    inv_mass = TailDenseMass(diag=jnp.ones((dim,), dtype),
                             tail_inv=tail_inv, tail_msqrt=tail_msqrt)
    eps = jnp.asarray(3e-3, dtype)

    results = {}
    I = args.evals
    T = args.transitions

    with jax.default_matmul_precision("highest"):
        # --- eval: the microbench numerator
        @jax.jit
        def run_eval(q):
            def body(q, _):
                v, g = jax.vmap(lambda r: logp_grad(r, one))(q)
                return q + jnp.asarray(1e-6, dtype) * g, v
            return jax.lax.scan(body, q, None, length=I)

        w = median_wall(lambda: run_eval(q))
        results["eval"] = {"wall_s": w, "us_per_leapfrog_batch": w / I * 1e6}

        # --- eval + dense mass matvec (leapfrog flops, no control flow)
        @jax.jit
        def run_eval_mass(q):
            def body(q, _):
                v, g = jax.vmap(lambda r: logp_grad(r, one))(q)
                return q + jnp.asarray(1e-6, dtype) * mass_vel(inv_mass, g), v
            return jax.lax.scan(body, q, None, length=I)

        w = median_wall(lambda: run_eval_mass(q))
        results["eval_mass"] = {"wall_s": w,
                                "us_per_leapfrog_batch": w / I * 1e6}

        # --- the true leapfrog body in a scan (static length)
        @jax.jit
        def run_leapfrog_scan(q):
            _, g0 = jax.vmap(lambda r: logp_grad(r, one))(q)
            p0 = jnp.zeros_like(q)

            def body(carry, _):
                qc, pc, gc = carry
                p_half = pc + 0.5 * eps * gc
                q_new = qc + eps * mass_vel(inv_mass, p_half)
                logp, g_new = jax.vmap(lambda r: logp_grad(r, one))(q_new)
                p_new = p_half + 0.5 * eps * g_new
                return (q_new, p_new, g_new), logp
            (qf, _, _), lps = jax.lax.scan(body, (q, p0, g0), None, length=I)
            return qf, lps

        w = median_wall(lambda: run_leapfrog_scan(q))
        results["leapfrog_scan"] = {"wall_s": w,
                                    "us_per_leapfrog_batch": w / I * 1e6}

        # --- full HMC transitions (while_loop, momentum, accept)
        hmc = make_hmc_step(L)

        def make_hmc_runner(jitter):
            @jax.jit
            def run_hmc(q, key):
                def body(carry, step):
                    qs, key = carry
                    key, *ck = jax.random.split(key, C + 1)
                    if jitter:
                        u = jax.random.uniform(jax.random.fold_in(ck[0], 1))
                        Lj = jnp.maximum(
                            1, jnp.ceil(u * L).astype(jnp.int32))
                    else:
                        Lj = jnp.asarray(L, jnp.int32)
                    lp = lambda r: logp_grad(r, one)
                    qs, info = jax.vmap(
                        lambda k, row: hmc(lp, k, row, eps, inv_mass, Lj)
                    )(jnp.stack(ck), qs)
                    return (qs, key), info.num_leapfrogs
                (qf, _), nlf = jax.lax.scan(
                    body, (q, key), jnp.arange(T))
                return qf, nlf
            return run_hmc

        key = jax.random.PRNGKey(0)
        run_fixed = make_hmc_runner(False)
        w = median_wall(lambda: run_fixed(q, key))
        results["hmc_fixed"] = {
            "wall_s": w, "leapfrogs": T * L,
            "us_per_leapfrog_batch": w / (T * L) * 1e6,
        }

        run_jit = make_hmc_runner(True)
        _, nlf = run_jit(q, key)
        # num_leapfrogs is reported per chain but the jittered length is
        # one shared scalar per transition: count each transition once
        n_exec = int(np.asarray(nlf)[..., 0].sum())
        w = median_wall(lambda: run_jit(q, key))
        results["hmc_jitter"] = {
            "wall_s": w, "leapfrogs_executed": n_exec,
            "us_per_leapfrog_batch": w / n_exec * 1e6,
            "tracks_executed_not_bound": bool(
                w < 0.75 * results["hmc_fixed"]["wall_s"]),
        }

    # --- the real sampler path: one on-device dispatch vs staged blocks.
    # Adaptation ON (the bench's real config) but tiny burnin; what we
    # compare is the SAMPLING phase wall per transition.
    def run_sampler(block):
        cfg = SamplerConfig(
            num_results=args.block_steps, num_burnin_steps=0,
            adaptation_fraction=0.0, adapt_mass_matrix=False,
            algorithm="hmc", hmc_num_leapfrogs=L,
            initial_step_size=float(eps),
            dispatch_block_steps=block,
        )
        t0 = time.time()
        samples, stats = run_nuts_chains(
            lambda r, b: logp_grad(r, b), q, jax.random.PRNGKey(1), cfg)
        jax.block_until_ready(stats.step_size)
        np.asarray(samples)  # force any remaining host fetch
        # shared jittered length: count each transition once, not per chain
        return time.time() - t0, np.asarray(stats.num_leapfrogs)[..., 0].sum()

    with jax.default_matmul_precision("highest"):
        run_sampler(0)  # compile both phases
        w0, n0 = run_sampler(0)
        run_sampler(50)
        w50, n50 = run_sampler(50)
    results["sampler_1dispatch"] = {
        "wall_s": w0, "leapfrogs_executed": int(n0),
        "us_per_leapfrog_batch": w0 / max(n0, 1) * 1e6,
    }
    results["sampler_blocked50_staged"] = {
        "wall_s": w50, "leapfrogs_executed": int(n50),
        "us_per_leapfrog_batch": w50 / max(n50, 1) * 1e6,
    }

    out = {
        "what": __doc__.split("\n")[0],
        "geometry": {"N_I": int(model.mag_I), "D": int(model.D),
                     "dim": int(dim), "chains": C, "L": L,
                     "dtype": "float32", "matmul": "highest"},
        "device": jax.devices()[0].device_kind,
        "cells": results,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
