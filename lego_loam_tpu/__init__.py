"""TPU-native LiDAR odometry & mapping framework (LeGO-LOAM capability set).

Built from scratch in JAX/XLA/Pallas; see SURVEY.md for the reference map.
"""

from .config import LegoLoamConfig, get_config, vlp16, vlp32c, hdl64e

__version__ = "0.1.0"

__all__ = [
    "LegoLoamConfig",
    "get_config",
    "vlp16",
    "vlp32c",
    "hdl64e",
]
