"""ODE model library (workload layer L5).

Each model is a pure-JAX ``f_vec(t, X, thetas) -> dX/dt`` with the contract of
the reference (magi_v2.py:28; examples in vignette.ipynb cell 3 and
test_magi_script.py:19-45): ``t`` has shape (N, 1), ``X`` has shape (N, D),
``thetas`` has shape (D_thetas,), and the result has shape (N, D). All ops are
broadcastable elementwise JAX — they trace inside jit at the three call sites
(theta init, gradient matching, sampler log-posterior) and vmap over chains
for free.
"""

from magi_v2_tpu.models.odes import (
    MODEL_REGISTRY,
    OdeModel,
    fitzhugh_nagumo_f_vec,
    hes1_f_vec,
    hes1_log_f_vec,
    lorenz_f_vec,
    lotka_volterra_f_vec,
    protein_transduction_f_vec,
    seir_f_vec,
    sirw_f_vec,
)

__all__ = [
    "MODEL_REGISTRY",
    "OdeModel",
    "seir_f_vec",
    "sirw_f_vec",
    "fitzhugh_nagumo_f_vec",
    "hes1_f_vec",
    "hes1_log_f_vec",
    "lorenz_f_vec",
    "lotka_volterra_f_vec",
    "protein_transduction_f_vec",
]
