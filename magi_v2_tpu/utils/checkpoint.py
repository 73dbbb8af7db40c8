"""Checkpoint / resume: serialize a fitted MAGI_v2 model and sampling results.

The reference has no persistence at all (results live in a returned dict,
magi_v2.py:412-425; SURVEY.md §5). Here: NPZ-based save/load of the full
fitted state so ``predict`` can resume — including the forecasting workflow
(update_kernel_matrices + re-predict) — without re-running initial_fit.
"""

from __future__ import annotations

import numpy as np

_FIT_FIELDS = [
    "I",
    "X_obs_discret",
    "phi1s",
    "phi2s",
    "sigma_sqs_init",
    "Xhat_init",
    "thetas_init",
    "mu_ds",
    "C_d_invs",
    "m_ds",
    "K_d_invs",
    "X_interp_obs",
    "ts_obs",
    "X_obs",
]


def save_fit(model, path: str) -> None:
    """Persist everything initial_fit computed (plus constructor data)."""
    arrays = {}
    for f in _FIT_FIELDS:
        v = getattr(model, f)
        if v is not None:
            arrays[f] = np.asarray(v)
    arrays["_meta"] = np.array(
        [model.D_thetas, -1 if model.BANDSIZE is None else model.BANDSIZE],
        dtype=np.int64,
    )
    np.savez_compressed(path, **arrays)


def load_fit(path: str, f_vec, config=None):
    """Reconstruct a fitted MAGI_v2 from save_fit output; ready to predict."""
    from magi_v2_tpu import preprocess
    from magi_v2_tpu.api import MAGI_v2
    from magi_v2_tpu.config import DEFAULT_CONFIG

    with np.load(path, allow_pickle=False) as z:
        data = {k: z[k] for k in z.files}
    D_thetas, bandsize = (int(v) for v in data["_meta"])
    model = MAGI_v2(
        D_thetas=D_thetas,
        ts_obs=data["ts_obs"],
        X_obs=data["X_obs"],
        bandsize=None if bandsize < 0 else bandsize,
        f_vec=f_vec,
        config=config or DEFAULT_CONFIG,
    )
    for f in _FIT_FIELDS:
        if f in data and f not in ("ts_obs", "X_obs"):
            setattr(model, f, data[f])
    model.mag_I = model.I.shape[0]
    model.beta = (model.D * model.mag_I) / model.N_ds.sum()
    model.obs_index = preprocess.build_observation_index(model.X_obs_discret)
    return model


def save_results(results: dict, path: str) -> None:
    """Persist a predict() results dict (nested kernel_results flattened)."""
    arrays = {}
    for k, v in results.items():
        if k == "kernel_results":
            for kk, vv in v.items():
                if vv is None:  # e.g. tail_inv_mass without a dense tail
                    continue
                arrays[f"kernel_results.{kk}"] = np.asarray(vv)
        elif v is not None:
            arrays[k] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_results(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        out, kr = {}, {}
        for k in z.files:
            if k.startswith("kernel_results."):
                kr[k.split(".", 1)[1]] = z[k]
            else:
                out[k] = z[k]
    out["kernel_results"] = kr
    return out
