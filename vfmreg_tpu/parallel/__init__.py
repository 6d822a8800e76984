from vfmreg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batched_registration_step,
    sharded_registration_step,
)
