from vfmreg_tpu.data.h5io import read_scenes, save_scene  # noqa: F401
