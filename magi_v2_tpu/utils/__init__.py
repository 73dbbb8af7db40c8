from magi_v2_tpu.utils.diagnostics import (
    effective_sample_size,
    potential_scale_reduction,
    summarize_chains,
)
from magi_v2_tpu.utils.data import load_seir_csv, simulate_ode

__all__ = [
    "effective_sample_size",
    "potential_scale_reduction",
    "summarize_chains",
    "load_seir_csv",
    "simulate_ode",
]
