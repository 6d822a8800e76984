"""Baseline point-descriptor extractors — the `vfm_reg/descriptors.py` surface.

Each extractor has the uniform signature
    extract_<name>_features(pcl, ...) -> (points, features)
(`descriptors.py:19-235`). Learned extractors need their torch checkpoints
(weight converters live next to each model); FPFH is fully self-contained.
"""

from vfmreg_tpu.descriptors.fpfh import extract_fpfh_features  # noqa: F401


def get_extractor(name: str):
    """Registry used by the evaluation harness; raises KeyError for extractors
    whose models/weights are not available in this build."""
    from vfmreg_tpu.descriptors import fpfh

    registry = {"fpfh": fpfh.extract_fpfh_features}
    try:
        from vfmreg_tpu.descriptors import dip

        registry["dip"] = dip.extract_dip_features
    except ImportError:
        pass
    try:
        from vfmreg_tpu.descriptors import gedi

        registry["gedi"] = gedi.extract_gedi_features
    except ImportError:
        pass
    try:
        from vfmreg_tpu.descriptors import fcgf

        registry["fcgf"] = fcgf.extract_fcgf_features
    except ImportError:
        pass
    try:
        from vfmreg_tpu.descriptors import gcl

        registry["gcl"] = gcl.extract_gcl_features
    except ImportError:
        pass
    try:
        from vfmreg_tpu.descriptors import spinnet

        registry["spinnet"] = spinnet.extract_spinnet_features
    except ImportError:
        pass
    return registry[name]
