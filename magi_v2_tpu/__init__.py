"""magi_v2_tpu — a TPU-native JAX framework for MAnifold-constrained Gaussian
process Inference (MAGI; Yang, Wong & Kou, PNAS 2021).

Re-designed from scratch for TPU (jax / XLA / pallas / pjit), providing the
full capability surface of the reference implementation
(``/root/reference/magi_v2.py``): Matern nu=2.01 GP kernel matrices and their
derivative cross-covariances, GP hyperparameter MLE with Fourier-informed
priors, theta / latent-trajectory initialization, a fused tempered
log-posterior, and a vmapped multi-chain NUTS/HMC sampler with in-warmup
step-size and mass-matrix adaptation and in-graph temperature annealing.

Key entry point: :class:`magi_v2_tpu.MAGI_v2` (API parity with the reference,
reference: magi_v2.py:20-73).
"""

from magi_v2_tpu.config import MagiConfig, enable_x64
from magi_v2_tpu.api import MAGI_v2

__version__ = "0.1.0"

__all__ = ["MAGI_v2", "MagiConfig", "enable_x64", "__version__"]
