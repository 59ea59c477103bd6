"""Compute ops: SH evaluation, covariance/projection math, rasterization, losses."""

from gaussian_splatting_tpu.ops.sh import eval_sh, sh_to_rgb, rgb_to_sh  # noqa: F401
from gaussian_splatting_tpu.ops.transforms import (  # noqa: F401
    quat_to_rotmat,
    build_covariance,
    build_scaling_rotation,
)
