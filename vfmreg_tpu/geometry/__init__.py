from vfmreg_tpu.geometry.se3 import (  # noqa: F401
    exp_se3,
    log_se3,
    exp_so3,
    log_so3,
    hat_so3,
    transform_points,
    orthogonalize_rotation,
    inverse_se3,
)
