"""Transform fusion: lidar-rate pose from odometry + low-rate map correction.

≙ the TransformFusion node (`transformFusion.cpp:188-304`), which re-derives
the map correction with closed-form euler composition and applies it to every
10 Hz odometry message. In SE(3):

    T_fused = T_map_at_k ∘ (T_odom_at_k)^{-1} ∘ T_odom_now

where k is the latest mapped frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import se3


def fuse_pose(R_map, t_map, R_odom_at_map, t_odom_at_map, R_odom, t_odom):
    """Compose the latest map correction with the newest odometry pose."""
    Rd, td = se3.relative(R_odom_at_map, t_odom_at_map, R_odom, t_odom)
    return se3.compose(R_map, t_map, Rd, td)
