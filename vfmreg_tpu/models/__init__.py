from vfmreg_tpu.models.vit import (  # noqa: F401
    ViTConfig,
    init_vit_params,
    vit_forward,
    load_torch_state_dict,
)
