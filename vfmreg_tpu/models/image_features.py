"""Image feature generation — the `ImageFeatureGenerator` rebuilt on the JAX ViT.

Behavioral clone of `vfm_reg/image_features.py:23-208`:

* preprocessing: resize to (patch_size * patch_h, patch_size * patch_w) with
  patch_h = 16 and patch_w = int(scale * img_w / patch_size), bilinear,
  antialias=False, then ImageNet mean/std normalization (`create_transform_:67-77`);
* `get_image_features(image, upsample)`: ViT forward -> [h, w, D] patch features,
  optionally bilinearly upsampled to the input resolution (align_corners=False),
  with an `.npy` on-disk cache keyed like the reference (`:79-117`);
* PCA-to-RGB with persistent fit (`run_pca:162-191`, featup.util.pca semantics:
  fit once, min-max per component, ×255, black for zero-descriptor points);
* `compute_similarity`: cosine similarity against a text embedding (`:194-208`) —
  takes a precomputed embedding vector since MaskCLIP's text tower is only
  available when its weights are supplied.

The main pipeline runs `use_featup=False` + bilinear upsampling
(`prepare_scenes.py:121`, `registration_node.py:57`); a JBU-style learned
upsampler can be slotted in via `upsampler=`.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfmreg_tpu.models.vit import PRESETS, ViTConfig, init_vit_params, vit_forward

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def preprocess_image(image: np.ndarray, patch_size: int, patch_h: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """uint8/float HxWx3 -> normalized [1, H', W', 3] resized to patch multiples.

    Mirrors `create_transform_` (`image_features.py:67-77`): ToTensor scaling to
    [0,1], bilinear resize with antialias=False, ImageNet normalization.
    """
    img_h, img_w = image.shape[:2]
    scale = (patch_size * patch_h) / img_h
    patch_w = int(scale * img_w / patch_size)
    out_h, out_w = patch_size * patch_h, patch_size * patch_w

    x = jnp.asarray(image, dtype=jnp.float32) / 255.0
    x = jax.image.resize(x, (out_h, out_w, 3), method="bilinear", antialias=False)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return np.asarray(x)[None], (img_h, img_w)


class TorchPCA:
    """Plain-numpy PCA matching featup.util.TorchPCA (mean-center + SVD projection)."""

    def __init__(self, n_components: int):
        self.n_components = n_components
        self.mean_: Optional[np.ndarray] = None
        self.components_: Optional[np.ndarray] = None

    def fit(self, x: np.ndarray) -> "TorchPCA":
        self.mean_ = x.mean(axis=0, keepdims=True)
        xc = x - self.mean_
        _, _, vt = np.linalg.svd(xc, full_matrices=False)
        self.components_ = vt[: self.n_components].T  # [D, k]
        return self

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean_) @ self.components_


def pca_to_rgb(
    features: np.ndarray, fit_pca: Optional[TorchPCA] = None, n_components: int = 3
) -> Tuple[np.ndarray, TorchPCA]:
    """featup.util.pca semantics: project, then min-max normalize per component."""
    flat = features.reshape(-1, features.shape[-1]).astype(np.float32)
    if fit_pca is None:
        fit_pca = TorchPCA(n_components).fit(flat)
    red = fit_pca.transform(flat)
    red = red - red.min(axis=0, keepdims=True)
    denom = red.max(axis=0, keepdims=True)
    red = red / np.where(denom > 0, denom, 1.0)
    return red.reshape(features.shape[:-1] + (n_components,)), fit_pca


class ImageFeatureGenerator:
    """Drop-in analogue of the reference class (`image_features.py:23`)."""

    def __init__(
        self,
        foundation_model: str = "dinov2",
        use_featup: bool = False,
        params: Optional[Dict[str, Any]] = None,
        config: Optional[ViTConfig] = None,
        seed: int = 0,
        pca_fit_file: Optional[Path] = None,
        featup_params: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.foundation_model_name = foundation_model
        self.use_featup = use_featup
        self.featup_params = featup_params
        if foundation_model == "dinov2":
            self.config = config or PRESETS["dinov2_vits14"]
            self.patch_size = 14
            self.feature_size = self.config.hidden_size
            if params is None:
                # Random weights — callers load real checkpoints via
                # `models.vit.load_torch_state_dict` (no network here).
                params = init_vit_params(jax.random.PRNGKey(seed), self.config)
        elif foundation_model == "maskclip":
            from vfmreg_tpu.models.maskclip import MaskCLIPConfig, init_maskclip_params

            self.config = config or MaskCLIPConfig()
            self.patch_size = 16  # `image_features.py:49-50`
            self.feature_size = self.config.embed_dim
            if params is None:
                params = init_maskclip_params(jax.random.PRNGKey(seed), self.config)
        else:
            raise ValueError(f"Unsupported foundation model: {foundation_model}")
        self.patch_h = 16  # same as FeatUp (`image_features.py:36`)
        self.params = params

        self.fit_pca: Dict[int, TorchPCA] = {}
        self.fit_pca_file = pca_fit_file
        if pca_fit_file is not None and Path(pca_fit_file).exists():
            with open(pca_fit_file, "rb") as f:
                self.fit_pca = pickle.load(f)

    # ------------------------------------------------------------------ forward
    def _forward(self, batch: np.ndarray) -> jnp.ndarray:
        if self.foundation_model_name == "maskclip":
            from vfmreg_tpu.models.maskclip import maskclip_forward

            return maskclip_forward(self.params, jnp.asarray(batch), self.config)["patches"]
        out = vit_forward(self.params, jnp.asarray(batch), self.config)
        return out["patches"]  # [B, h, w, D]

    def get_image_features(
        self, image: np.ndarray, upsample: bool = False, cache_file: Optional[Path] = None
    ) -> np.ndarray:
        """[H, W, D] (upsample=True) or [h, w, D] patch-grid features.

        Mirrors `get_image_features` (`image_features.py:79-117`) including the
        `.npy` cache naming `<stem>_{use_featup}_{upsample}.npy`.
        """
        if cache_file:
            cache_file = Path(cache_file)
            cache_file = cache_file.parent / f"{cache_file.stem}_{self.use_featup}_{upsample}.npy"
            if cache_file.exists():
                return np.load(cache_file, allow_pickle=True)

        batch, (img_h, img_w) = preprocess_image(image, self.patch_size, self.patch_h)
        feats = self._forward(batch)  # [1, h, w, D]
        if upsample:
            if self.use_featup:
                # FeatUp path (`models/featup.py`): the learned JBU stack when
                # its weights are available (VFMREG_FEATUP_WEIGHTS or the
                # `featup_params` ctor arg), else classical guided JBU.
                if self.featup_params is None:
                    import os

                    wpath = os.environ.get("VFMREG_FEATUP_WEIGHTS")
                    if wpath and Path(wpath).exists():
                        import torch

                        from vfmreg_tpu.models.featup import load_featup_state_dict

                        sd = torch.load(wpath, map_location="cpu")
                        self.featup_params = load_featup_state_dict(
                            {k: v.numpy() for k, v in sd.items()}
                        )
                if self.featup_params is not None:
                    from vfmreg_tpu.models.featup import jbu_stack_upsample

                    hr = jbu_stack_upsample(self.featup_params, feats[0], jnp.asarray(batch[0]))
                    feats = jax.image.resize(
                        hr[None], (1, img_h, img_w, hr.shape[-1]), method="bilinear", antialias=False
                    )
                else:
                    from vfmreg_tpu.models.featup import jbu_upsample

                    guide = jnp.asarray(image, dtype=jnp.float32) / 255.0
                    feats = jbu_upsample(feats[0], guide, img_h, img_w)[None]
            else:
                feats = jax.image.resize(
                    feats, (1, img_h, img_w, feats.shape[-1]), method="bilinear", antialias=False
                )
        out = np.asarray(feats[0], dtype=np.float32)

        if cache_file:
            cache_file.parent.mkdir(parents=True, exist_ok=True)
            np.save(cache_file, out)
        return out

    def get_image_features_pca(
        self, image: np.ndarray, upsample: bool = False, n_components: int = 3
    ) -> Tuple[np.ndarray, np.ndarray]:
        feats = self.get_image_features(image, upsample=upsample)
        pca_feats, fit = pca_to_rgb(feats, self.fit_pca.get(n_components), n_components)
        if n_components not in self.fit_pca:
            self.fit_pca[n_components] = fit
        if n_components == 3:
            pca_feats = (pca_feats * 255.0).astype(np.uint8)
        return feats, pca_feats

    # ---------------------------------------------------------------- utilities
    def run_pca(
        self, features: np.ndarray, refit_pca: bool = False, n_components: int = 3
    ) -> np.ndarray:
        """PCA-to-RGB for point descriptors (`run_pca`, `image_features.py:162-191`)."""
        if refit_pca:
            self.fit_pca.pop(n_components, None)
        pca_feats, fit = pca_to_rgb(features, self.fit_pca.get(n_components), n_components)
        if n_components not in self.fit_pca:
            self.fit_pca[n_components] = fit
            if self.fit_pca_file is not None:
                with open(self.fit_pca_file, "wb") as f:
                    pickle.dump(self.fit_pca, f)
        if n_components == 3:
            pca_feats = (pca_feats * 255.0).astype(np.uint8)
            zero_rows = np.all(features == 0, axis=-1)
            pca_feats[zero_rows] = 0
        return pca_feats

    def set_text_encoder(self, text_params, text_config=None, tokenizer=None) -> None:
        """Attach a CLIP text tower (`models.clip_text`) so prompts encode
        natively; `tokenizer` is a `SimpleTokenizer` over the standard merges."""
        from vfmreg_tpu.models.clip_text import CLIPTextConfig

        self.text_params = text_params
        self.text_config = text_config or CLIPTextConfig()
        self.tokenizer = tokenizer

    def encode_text(self, prompt: str) -> np.ndarray:
        """prompt -> CLIP text embedding (`image_features.py:195-197`:
        tokenize + encode_text)."""
        from vfmreg_tpu.models.clip_text import clip_text_forward

        if getattr(self, "text_params", None) is None or self.tokenizer is None:
            raise RuntimeError(
                "text encoder not attached: call set_text_encoder(params, cfg, tokenizer)"
            )
        tokens = self.tokenizer.tokenize(prompt, self.text_config.context_length)
        emb = clip_text_forward(self.text_params, jnp.asarray(tokens), self.text_config)
        return np.asarray(emb)[0]

    def compute_similarity(self, features: np.ndarray, embedding) -> np.ndarray:
        """Cosine similarity of per-point features vs a text prompt or a
        precomputed embedding vector (`compute_similarity`,
        `image_features.py:194-208`); zero rows stay zero."""
        if isinstance(embedding, str):
            embedding = self.encode_text(embedding)
        emb = embedding.reshape(-1)
        emb = emb / np.linalg.norm(emb)
        norm = np.linalg.norm(features, axis=-1, keepdims=True)
        feats_n = np.where(norm > 0, features / np.maximum(norm, 1e-20), 0.0)
        return feats_n @ emb
