from magi_v2_tpu.ops.bessel import kv, kv_ladder, kvp
from magi_v2_tpu.ops.kernels import matern_gram, magi_kernel_matrices

__all__ = ["kv", "kv_ladder", "kvp", "matern_gram", "magi_kernel_matrices"]
