from vfmreg_tpu.registration.icp import register_frame_icp  # noqa: F401
from vfmreg_tpu.registration.procrustes import kabsch, weighted_kabsch  # noqa: F401
