from vfmreg_tpu.utils.pcl import KNeighbors, transform_pcl  # noqa: F401
from vfmreg_tpu.utils.logging import print_msg  # noqa: F401
