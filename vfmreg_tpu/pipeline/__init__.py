from vfmreg_tpu.pipeline.registration_node import RegistrationNode  # noqa: F401
