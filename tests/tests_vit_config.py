"""Shared tiny ViT config for data/pipeline tests (fast CPU forward)."""

from vfmreg_tpu.models.vit import ViTConfig

SMALL_VIT = ViTConfig(
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    patch_size=14,
    pretrain_img_size=56,
    use_flash_attention=False,
)
