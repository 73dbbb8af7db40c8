"""Discriminate the Lorenz dense-grid theta offset: posterior property vs
band-truncation artifact.

The converged N_I=1025 acceptance run (results/lorenz1025_r3j.json) carries
a theta offset of ~(-10%, -3%, -11%) that the floor sweep showed is
tempering-independent (BASELINE_MEASURED round3 "tempered_floor_sweep").
What the floor sweep canNOT distinguish is whether the offset lives in the
MAGI posterior itself or in the bandsize=100 truncation of the precision
operators (at N_I=1025 the kernel's index-space correlation length is 2x
the N_I=513 grid where recovery is near-exact, so truncation bites harder).

This probe computes the EXACT theta-conditional mode given the noiseless
true trajectory on the grid. The Lorenz field (models/odes.py; reference
f_vec contract magi_v2.py:28) is linear in theta given X:

    f_1 = theta_0 (y - x),  f_2 = theta_1 x - xz - y,  f_3 = xy - theta_2 z

so argmin_theta sum_d || S_d (f_d(X, theta) - m_d (x_d - mu_d)) ||^2 is a
per-component 1-dim weighted least squares with closed form

    theta_d* = (a_d' K_eff_d c_d) / (a_d' K_eff_d a_d)

(no sampler, no optimizer, float64 NumPy throughout — independent of the
JAX sampling stack). K_eff is evaluated per operator set:

  dense       : K_eff = K_inv (pinv-based, PSD — what storage='dense' sums)
  banded(b)   : K_eff = band(S)' band(S), S = sym_sqrt(band(K_inv, b)),
                m -> band(m, b) — EXACTLY the factored clamped form the
                banded sampler evaluates (posterior.py to_banded_data)
  banded-raw  : K_eff = band(K_inv, b) — the reference's own band_part
                semantics (magi_v2.py:271-274), for comparison

If the banded theta* reproduces the sampled -10% offset while dense theta*
sits at truth, the offset is a truncation artifact; if both carry it, it is
intrinsic to the operators at this grid density; if neither does, the
offset enters through the X-posterior (trajectory smoothing), not the
theta conditional.
"""

import json
import os

import numpy as np


def band_part_np(A, b):
    n = A.shape[-1]
    i = np.arange(n)
    mask = np.abs(i[:, None] - i[None, :]) <= b
    return A * mask


def sym_sqrt_np(A):
    w, v = np.linalg.eigh((A + A.T) / 2.0)
    w = np.maximum(w, 0.0)
    return (v * np.sqrt(w)) @ v.T


def theta_cond_mode(K_effs, m_ds, X, mu_ds):
    """Closed-form per-component WLS theta given X (Lorenz field)."""
    x, y, z = X[:, 0], X[:, 1], X[:, 2]
    Xc = X - mu_ds[None, :]
    # (coef-of-theta, theta-free part of f_d) per component
    parts = [
        (y - x, np.zeros_like(x)),        # f1 = th0*(y-x)
        (x, -(x * z) - y),                # f2 = th1*x - xz - y
        (-z, x * y),                      # f3 = -th2*z + xy
    ]
    theta, quads = [], []
    for d, (a, f0) in enumerate(parts):
        c = m_ds[d] @ Xc[:, d] - f0       # residual r = theta*a - c
        Ka = K_effs[d] @ a
        quad = float(a @ Ka)
        # banded-raw K_eff = band(K_inv, b) is severely indefinite at these
        # grid sizes (posterior.to_banded_data docstring): the stationary
        # point is then not a WLS minimizer — flag it rather than divide
        # silently (ADVICE r3)
        quads.append(quad)
        theta.append(float((c @ Ka) / quad))
    return np.array(theta), np.array(quads)


def run_case(n_obs, disc, bands):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from magi_v2_tpu import MAGI_v2
    from magi_v2_tpu.models import lorenz_f_vec
    from magi_v2_tpu.utils.data import simulate_ode

    true = np.array([10.0, 28.0, 8.0 / 3.0])
    ts_obs, X_obs, _ = simulate_ode(
        lorenz_f_vec, x0=np.array([-8.0, 7.0, 27.0]), thetas=true,
        t_max=2.0, n_obs=n_obs, noise_sd=0.5, substeps=50,
    )
    # dense operators: hyperparameter fitting precedes banding, so one
    # bandsize=None fit supplies every operator variant
    model = MAGI_v2(D_thetas=3, ts_obs=ts_obs, X_obs=X_obs, bandsize=None,
                    f_vec=lorenz_f_vec)
    model.initial_fit(discretization=disc)
    N_I = model.mag_I
    grid = np.asarray(model.I[:, 0], np.float64)
    _, _, X_true = simulate_ode(
        lorenz_f_vec, x0=np.array([-8.0, 7.0, 27.0]), thetas=true,
        t_max=2.0, n_obs=N_I, noise_sd=0.0, substeps=50,
    )
    assert np.allclose(grid, np.linspace(0.0, 2.0, N_I), atol=1e-12)

    K_inv = np.asarray(model.K_d_invs, np.float64)
    m_ds = np.asarray(model.m_ds, np.float64)
    mu = np.asarray(model.mu_ds, np.float64)
    X = np.asarray(X_true, np.float64)

    out = {"N_I": N_I, "theta_true": true.tolist(), "cases": {}}

    def record(name, K_effs, m_eff):
        th, quads = theta_cond_mode(K_effs, m_eff, X, mu)
        out["cases"][name] = {
            "theta": [round(v, 4) for v in th],
            "rel_err": [round(v, 4) for v in (th - true) / true],
            # a' K_eff a per component: the stationary point is a genuine
            # WLS minimizer only when positive (raw band_part truncation
            # can make K_eff indefinite)
            "quad_form": [float(f"{q:.4g}") for q in quads],
            "quad_positive": bool(np.all(quads > 0)),
        }
        print(f"  N_I={N_I} {name:24s} theta={np.round(th, 3)} "
              f"rel={np.round((th - true) / true, 4)} "
              f"quad_pos={bool(np.all(quads > 0))}", flush=True)

    record("dense", K_inv, m_ds)
    for b in bands:
        Kb = band_part_np(K_inv, b)
        mb = band_part_np(m_ds, b)
        record(f"banded_raw_b{b}", Kb, mb)
        S = np.stack([band_part_np(sym_sqrt_np(Kb[d]), b)
                      for d in range(3)])
        K_clamped = np.einsum("dij,dik->djk", S, S)
        record(f"banded_factored_b{b}", K_clamped, mb)
    return out


def main():
    results = {
        "what": ("theta-conditional mode given the TRUE trajectory, exact "
                 "WLS closed form, f64 NumPy — discriminates banded "
                 "truncation vs intrinsic posterior offset at dense grids"),
        "sampled_reference": {
            "run": "results/lorenz1025_r3j.json (b=100, tempered 0.15)",
            "theta_rel_err": [-0.1046, -0.0316, -0.1132],
        },
    }
    results["N_I_513"] = run_case(n_obs=257, disc=1, bands=[100])
    results["N_I_1025"] = run_case(n_obs=257, disc=2, bands=[100, 200])
    os.makedirs("results", exist_ok=True)
    with open("results/lorenz_theta_conditional_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
