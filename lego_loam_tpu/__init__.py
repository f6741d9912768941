"""TPU-native LiDAR odometry & mapping framework (LeGO-LOAM capability set).

Built from scratch in JAX/XLA/Pallas; see SURVEY.md for the reference map.
"""

import os as _os

import jax as _jax

# TPU matmuls default to bfloat16 operands: a 50 m coordinate rounds to
# ~0.2 m steps, which silently wrecks every point-transform einsum
# (q @ R.T + t), the NN distance matmuls, and the PCA fits — CPU runs were
# mm-accurate while identical TPU runs drifted meters per 50 frames
# (measured 2.4 m ATE over 48 frames; 0.01 m with float32). Geometry at
# these magnitudes needs full f32 operands; the K=3 matmuls this slows are
# a negligible share of the pipeline, so accuracy-first is the only sane
# default. Opt out with LEGO_LOAM_MATMUL_PRECISION (e.g. "bfloat16").
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("LEGO_LOAM_MATMUL_PRECISION", "float32"),
)

from .config import LegoLoamConfig, get_config, vlp16, vlp32c, hdl64e

__version__ = "0.1.0"

__all__ = [
    "LegoLoamConfig",
    "get_config",
    "vlp16",
    "vlp32c",
    "hdl64e",
]
