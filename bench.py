"""Benchmark: ESS/sec on the SEIR posterior with 256 vmapped HMC chains.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition (BASELINE.json north star): pooled effective samples per
second of SAMPLING wall-clock for the worst theta component, 256 chains on
one chip, SEIR vignette geometry (N=81 obs, discretization=1 -> N_I=161,
full hyperparameter + theta initialization).

Methodology (round-2 fixes per VERDICT.md Weak #1/#2):

- A short compile-priming run executes first so the timed run hits the
  compiled-executable cache (the sampler auto-blocks at <=50 transitions
  per dispatch on the axon runtime, so block executables are shape-stable
  across runs); round-1 walls swung 174-316 s run-to-run on tunnel compile
  variance.
- The timed wall covers predict() of the main run only (setup/priming
  excluded, reported separately in detail).
- The JSON self-certifies convergence: rhat_max is computed from split
  R-hat over the 256 chains and the "converged" flag gates at 1.05.

vs_baseline: ratio to the reference-equivalent single-chain CPU run. The
TFP reference itself crashes at HEAD (SURVEY.md §4) and publishes no
numbers (BASELINE.md), so the baseline is our measured single-chain,
annealed, identity-mass, float64 CPU configuration — algorithmically the
reference's setup (same posterior, same NUTS/dual-averaging/anneal
schedule, magi_v2.py:360-396) with its dispatch pathologies removed, i.e.
an upper bound on the reference's throughput, making vs_baseline
conservative. Recorded in BASELINE_MEASURED.json.
"""

import json
import os
import time

import numpy as np

NUM_CHAINS = 256
NUM_BURNIN = 1000
NUM_RESULTS = 1000
# Operating points (measured, results/seir_dense_mass_probe.json +
# BASELINE_MEASURED "round3_dense_mass"): the full dense metric
# (mass_matrix="dense") whitens the X-theta ridge (|corr| up to 0.89,
# results/seir_corr_probe.json) that forced L=192 under the diagonal
# metric (ESS_min 829 at L64 -> 18038 at L192). Dense-metric L-sweep on
# the TRUE posterior (warmup_only, ESS_min is the tunnel-robust
# quantity): L=96 -> 826 (warmup collapses below L~128), L=128 -> 43460,
# L=160 -> 113116, L=192 -> 177366 (the ESS-per-leapfrog peak, rhat
# 1.0005, reproduced at 188126 on a second seed), L=256 -> 132246.
# The TEMPERED cell (the headline, reference anneal schedule) is
# seed-fragile above L=128 with the RAW covariance estimate: worst-seed
# ESS_min 1664 (rhat 1.046) at L=160 and 5033 (div 1.2%) at L=192 vs
# 27146 (div 0.16%) at L=128 — the annealed warmup's dense-covariance
# estimate degrades on some seeds at long L. dense_shrinkage=0.2
# (correlations pulled 20% toward the diagonal) rescues it: seeds 0-2
# at tempered L=192 measure ESS_min 81k-100k, rhat <= 1.0029, div 0.4%
# (BASELINE_MEASURED "l_sweep_extension"). The true-posterior cell
# needs no shrinkage (stable raw: ESS_min 177k/188k over two seeds).
HMC_LEAPFROGS = 192
TEMPERED_SHRINKAGE = 0.2
TRUE_POST_LEAPFROGS = 192
MASS_MATRIX = "dense"


# TPU v5e (v5 lite) public peak numbers (cloud.google.com/tpu/docs/v5e):
# 197 TFLOP/s bf16 on the MXU, 819 GB/s HBM bandwidth per chip. The
# sampler pins matmul_precision="highest" (6-pass bf16 emulation of f32,
# CLAUDE.md "matmul precision 'high' is UNSAFE"), so the f32-"highest"
# MXU ceiling is 197/6 ~ 32.8 TFLOP/s.
V5E_BF16_PEAK_FLOPS = 197e12
V5E_F32_HIGHEST_PEAK_FLOPS = V5E_BF16_PEAK_FLOPS / 6.0
V5E_HBM_BYTES_PER_S = 819e9


def _roofline(model, dtype, micro_evals_per_sec):
    """FLOP/byte accounting of the fused log-posterior+grad eval.

    Lowers the exact batched eval the microbench times (256 vmapped
    chains, matmul 'highest') and reads XLA's post-optimization cost
    analysis: 'flops' counts logical HLO flops, 'bytes accessed' the
    HBM traffic of the fused executable. Combined with the measured
    evals/s this gives achieved TFLOP/s, achieved GB/s, MFU against the
    f32-"highest" MXU ceiling, and names the roofline bound (whichever
    of MXU time / HBM time dominates at the measured throughput).
    """
    import jax
    import jax.numpy as jnp

    from magi_v2_tpu.sampler.magi_state import flatten_state

    mode, *_ = model._build_sampling_setup("precond", "dense", dtype)
    q0 = flatten_state(
        mode.X0,
        jnp.zeros((model.D,), dtype),
        jnp.zeros((model.D_thetas,), dtype),
    )
    q = jnp.broadcast_to(q0, (NUM_CHAINS, q0.shape[0]))
    one = jnp.asarray(1.0, dtype)
    f = jax.jit(lambda q: jax.vmap(lambda r: mode.logp_grad(r, one))(q))
    try:
        with jax.default_matmul_precision("highest"):
            ca = f.lower(q).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops_batch = float(ca["flops"])
        bytes_batch = float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # cost analysis is backend-best-effort
        return {"error": f"cost_analysis unavailable: {e!r}"}

    flops_per_eval = flops_batch / NUM_CHAINS
    bytes_per_eval = bytes_batch / NUM_CHAINS
    achieved_flops = micro_evals_per_sec * flops_per_eval
    achieved_bytes = micro_evals_per_sec * bytes_per_eval
    # roofline: time per eval if purely MXU-bound vs purely HBM-bound
    t_mxu = flops_per_eval / V5E_F32_HIGHEST_PEAK_FLOPS
    t_hbm = bytes_per_eval / V5E_HBM_BYTES_PER_S if bytes_per_eval else 0.0
    t_meas = 1.0 / micro_evals_per_sec
    if t_hbm >= t_mxu:
        bound = "HBM-bandwidth"
        roofline_frac = t_hbm / t_meas
    else:
        bound = "MXU"
        roofline_frac = t_mxu / t_meas
    next_10x = (
        "cut HBM bytes/eval: the pinned f32-'highest' matmuls run as 6 "
        "bf16 passes re-streaming operands, so a numerically-safe "
        "reduced-precision path for the large kernel-matrix matvecs (or "
        "one fused pallas pass over the four quadratic-form terms) is "
        "the lever — more MXU FLOP/s does not help at this intensity"
        if t_hbm >= t_mxu else
        "raise MXU utilization: batch the per-term matvecs into fewer, "
        "larger matmuls (pad-free tile shapes) and relax the 6-pass "
        "'highest' emulation where a 3-pass term is provably safe"
    )
    return {
        "flops_per_eval": round(flops_per_eval, 1),
        "bytes_per_eval": round(bytes_per_eval, 1),
        "arithmetic_intensity_flops_per_byte": round(
            flops_per_eval / bytes_per_eval, 2
        ) if bytes_per_eval else None,
        "achieved_tflops": round(achieved_flops / 1e12, 3),
        "achieved_hbm_gb_per_s": round(achieved_bytes / 1e9, 1),
        "mfu_pct_f32_highest": round(
            100 * achieved_flops / V5E_F32_HIGHEST_PEAK_FLOPS, 2
        ),
        "mfu_pct_bf16_peak": round(
            100 * achieved_flops / V5E_BF16_PEAK_FLOPS, 2
        ),
        "bound": bound,
        "pct_of_roofline": round(100 * roofline_frac, 1),
        "next_10x": next_10x,
        "note": (
            "bound = max(MXU time, HBM time) at the eval's intensity; "
            "pct_of_roofline = that bound's share of the measured eval "
            "time (the remainder is inter-fusion traffic/launch overhead "
            "the analysis attributes to neither peak)."
        ),
    }


def _microbench_fused_eval(model, dtype, iters=2000, repeats=3):
    """Median fused log-posterior+grad evals/sec/chip over ``repeats``
    timed dispatches of ``iters`` chained vmapped evals (256 chains)."""
    import jax
    import jax.numpy as jnp

    from magi_v2_tpu.sampler.magi_state import flatten_state

    mode, *_ = model._build_sampling_setup("precond", "dense", dtype)
    logp_grad = mode.logp_grad
    q0 = flatten_state(
        mode.X0,
        jnp.zeros((model.D,), dtype),
        jnp.zeros((model.D_thetas,), dtype),
    )
    q = jnp.broadcast_to(q0, (NUM_CHAINS, q0.shape[0]))
    one = jnp.asarray(1.0, dtype)

    @jax.jit
    def run(q):
        def body(q, _):
            v, g = jax.vmap(lambda r: logp_grad(r, one))(q)
            # tiny state feedback serializes the evals and defeats DCE
            return q + jnp.asarray(1e-6, dtype) * g, v
        q, vs = jax.lax.scan(body, q, None, length=iters)
        return q, vs

    walls = []
    with jax.default_matmul_precision("highest"):
        jax.block_until_ready(run(q))          # compile
        for _ in range(repeats):
            t0 = time.time()
            jax.block_until_ready(run(q))
            walls.append(time.time() - t0)
    return iters * NUM_CHAINS / sorted(walls)[len(walls) // 2]


def main():
    import jax

    # persistent compilation cache: the sampler's block functions compile
    # once and reuse across runs (the axon runtime advertises compile-cache
    # support; harmless elsewhere)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.magi_jax_cache_axon"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    # Precision policy: setup (kernel matrices, pinv, hyperparameter MLE,
    # theta init) runs on CPU under a scoped jax.enable_x64 — handled
    # inside the library (config.setup_on_cpu). Do NOT enable x64 globally
    # here: incidental f64/int64 ops in the TPU sampling path measured
    # hangs/kernel faults on the TPU backend.

    from magi_v2_tpu import MAGI_v2, MagiConfig
    from magi_v2_tpu.models import seir_f_vec
    from magi_v2_tpu.utils import summarize_chains
    from magi_v2_tpu.utils.data import load_seir_csv, simulate_ode

    try:
        ts_obs, X_obs, _ = load_seir_csv(t_max=4.0, d_obs=20)
    except (FileNotFoundError, OSError):
        ts_obs, X_obs, _ = simulate_ode(
            seir_f_vec,
            x0=np.array([0.1, 0.05, 0.0]),
            thetas=np.array([6.0, 0.6, 1.8]),
            t_max=4.0,
            n_obs=81,
            noise_sd=0.005,
        )

    # float32 sampling dtype: the TPU fast path (f64 parity mode is tested
    # in CI; the MXU has no native f64).
    cfg = MagiConfig().replace(dtype=jnp.float32)
    model = MAGI_v2(
        D_thetas=3, ts_obs=ts_obs, X_obs=X_obs, bandsize=80,
        f_vec=seir_f_vec, config=cfg,
    )
    t0 = time.time()
    model.initial_fit(discretization=1)
    setup_s = time.time() - t0

    common = dict(
        num_chains=NUM_CHAINS,
        seed=0,
        init_jitter=0.01,
        # jittered fixed-length HMC keeps all 256 vmapped chains in lockstep
        # (no slowest-tree sync): measured faster than NUTS at identical
        # theta recovery and better R-hat (BASELINE_MEASURED.json)
        algorithm="hmc",
        hmc_num_leapfrogs=HMC_LEAPFROGS,
        # full-state dense inverse mass estimated in the Welford window
        # (sampler/mass.py): rotates the X-theta ridge a diagonal cannot
        mass_matrix=MASS_MATRIX,
        # sample the same (tempered) posterior as the reference so the
        # vs_baseline ratio compares identical statistical tasks; the
        # library default is the statistically-sound warmup_only mode
        # (its ESS/s is recorded in BASELINE_MEASURED.json)
        anneal_mode="reference",
        # rescue the tempered warmup's long-L covariance misestimation
        # (see the operating-point note); the true-posterior run below
        # overrides this back to 0.0
        dense_shrinkage=TEMPERED_SHRINKAGE,
        # two-window staged mass adaptation, scales first (diag) then the
        # dense correlations from chains already mixing under them: kills
        # the 5-7x worst-seed ESS tail outright — 10-seed sweep ESS_min
        # 120k-131k, worst/median 1.02x, div <= 0.011% (results/
        # seir_seed_sweep_2win_diag1.json vs seir_seed_sweep.json's
        # 13k-100k); the true-posterior run below keeps the single-window
        # default (never fragile there)
        mass_window=(0.25, 0.45),
        mass_window2=(0.50, 0.72),
        mass_window1_diag=True,
    )

    # compile-priming: >=50+50 steps shares the 50-transition dispatch-block
    # executables with the timed run, warming both the in-process and the
    # persistent compile cache plus the tunnel
    t0 = time.time()
    model.predict(num_results=50, num_burnin_steps=50, **common)
    prime_s = time.time() - t0

    # median-of-5 timed runs (VERDICT round-2 Weak #3; round-4 Weak #2
    # raised the count): ESS_min is seed-stable but the axon-tunnel wall
    # swings up to 3x run-to-run, so the headline ESS/s is the median with
    # the min-max band in the detail, and a separate profiled run reports
    # the tunnel-free device-time ESS/s
    def timed_run(seed, **overrides):
        kw = dict(common, **overrides)
        kw["seed"] = seed
        t0 = time.time()
        res = model.predict(
            num_results=NUM_RESULTS, num_burnin_steps=NUM_BURNIN, **kw
        )
        wall = time.time() - t0
        s = summarize_chains(res["thetas_samps"], wall)
        s["wall_s"] = wall
        s["timings"] = res.get("timings")
        s["divergence_rate"] = float(
            res["kernel_results"]["divergences"].mean()
        )
        # Sampler-derived fused log-posterior+grad evals/sec/chip (the
        # second half of the BASELINE.json north-star metric): every HMC
        # leapfrog is exactly one fused eval. The stored per-draw leapfrog
        # counts share warmup's jitter distribution (one shared jittered
        # length per transition, sampler/run.py), so the sampling-phase
        # mean extends to the whole (burnin + results) wall.
        mean_L = float(res["kernel_results"]["num_leapfrogs"].mean())
        s["fused_evals_per_sec"] = (
            (NUM_BURNIN + NUM_RESULTS) * mean_L * NUM_CHAINS / wall
        )
        return s

    runs = [timed_run(seed) for seed in range(5)]
    walls = [r["wall_s"] for r in runs]
    ess_rates = sorted(r["ess_per_sec_min"] for r in runs)
    ess_per_sec = ess_rates[len(ess_rates) // 2]    # median of 5
    rhat_max = max(r["rhat_max"] for r in runs)
    ess_min = min(r["ess_min"] for r in runs)

    # Device-time ESS/s (VERDICT r4 Weak #2): one extra run with
    # profile_timings=True records PER-BLOCK walls under per-block device
    # sync; n_blocks x min(block wall) extrapolates steady-state device
    # compute per phase, discarding tunnel hiccups that inflate the wall
    # headline's run-to-run band. Separates sampler quality from
    # transport luck: ESS_min / device-compute-seconds.
    prof = timed_run(10, profile_timings=True)
    tm = prof["timings"] or {}
    dev_s = band_dev = None
    wb, sb = tm.get("warmup_block_walls_s"), tm.get("block_walls_s")
    if wb and sb:
        dev_s = (tm.get("eps_init_s", 0.0)
                 + len(wb) * min(wb) + len(sb) * min(sb))
        ess_per_device_sec = prof["ess_min"] / dev_s
        # intra-run jitter band on the same estimator: median vs min
        med = (tm.get("eps_init_s", 0.0)
               + len(wb) * sorted(wb)[len(wb) // 2]
               + len(sb) * sorted(sb)[len(sb) // 2])
        band_dev = med / dev_s

    # the true-posterior datapoint (library default anneal_mode): the
    # tempered headline compares like-for-like with the reference, this one
    # certifies throughput on the statistically-sound target (at its own
    # measured-optimal trajectory length; see the operating-point note)
    true_post = timed_run(3, anneal_mode="warmup_only",
                          hmc_num_leapfrogs=TRUE_POST_LEAPFROGS,
                          dense_shrinkage=0.0,
                          mass_window=None, mass_window2=None,
                          mass_window1_diag=False)

    # Direct microbench of the same fused eval: N back-to-back vmapped
    # logp+grad calls at the bench geometry (precond/dense mode, the exact
    # function the sampler leapfrogs through, at the sampler's pinned
    # matmul precision), chained through the state so XLA cannot elide
    # them. Measures the eval kernel itself without HMC bookkeeping.
    micro_evals_per_sec = _microbench_fused_eval(model, jnp.float32)
    roofline = _roofline(model, jnp.float32, micro_evals_per_sec)

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            baseline = json.load(fh)
        ref = baseline.get("cpu_single_chain_ess_per_sec")
        if ref:
            vs_baseline = ess_per_sec / ref

    print(json.dumps({
        "metric": "SEIR theta ESS/sec (min component, 256 chains, pooled)",
        "value": round(ess_per_sec, 3),
        "unit": "ESS/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "detail": {
            "ess_per_sec_band_5_runs": [round(ess_rates[0], 1),
                                        round(ess_rates[-1], 1)],
            # steady-state device-compute metric (per-block-min
            # extrapolation from the profiled run; tunnel-jitter-free)
            "ess_per_device_sec": (
                round(ess_per_device_sec, 1) if dev_s else None
            ),
            "device_compute_s": round(dev_s, 2) if dev_s else None,
            "device_band_median_over_min": (
                round(band_dev, 3) if band_dev else None
            ),
            "profiled_run_ess_min": round(prof["ess_min"], 1),
            "ess_min": round(ess_min, 1),
            "rhat_max": round(rhat_max, 4),
            "converged": bool(rhat_max <= 1.05),
            "wall_s_per_run": [round(w, 2) for w in walls],
            "setup_s": round(setup_s, 2),
            "prime_s": round(prime_s, 2),
            "fresh_machine_note": (
                "first-ever run pays prime_s compile (cold persistent "
                "cache + tunnel); steady-state cost is wall_s"
            ),
            "true_posterior_warmup_only": {
                "ess_per_sec_min": round(true_post["ess_per_sec_min"], 3),
                "ess_min": round(true_post["ess_min"], 1),
                "rhat_max": round(true_post["rhat_max"], 4),
                "wall_s": round(true_post["wall_s"], 2),
                "hmc_leapfrogs": TRUE_POST_LEAPFROGS,
                "fused_eval_per_sec_per_chip": round(
                    true_post["fused_evals_per_sec"], 1
                ),
            },
            # second north-star metric (BASELINE.json "ESS/sec; fused
            # log-posterior+grad evals/sec per chip"): sampler-derived =
            # leapfrogs x chains / sampling wall (median run);
            # microbench = chained vmapped evals without HMC bookkeeping
            "fused_eval_per_sec_per_chip": {
                "sampler_derived": round(sorted(
                    r["fused_evals_per_sec"] for r in runs
                )[1], 1),
                "microbench": round(micro_evals_per_sec, 1),
                "microbench_iters_x_chains": [2000, NUM_CHAINS],
            },
            # roofline/MFU accounting of the fused eval (VERDICT r4
            # Missing #3): XLA cost analysis x measured evals/s vs the
            # v5e f32-"highest" MXU ceiling and HBM bandwidth
            "roofline": roofline,
            "num_chains": NUM_CHAINS,
            "steps": f"{NUM_BURNIN}+{NUM_RESULTS}",
            "hmc_leapfrogs": HMC_LEAPFROGS,
            "mass_matrix": MASS_MATRIX,
            "dense_shrinkage": TEMPERED_SHRINKAGE,
            "divergence_rate": runs[0]["divergence_rate"],
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
