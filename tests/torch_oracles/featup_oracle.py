"""Torch oracle of FeatUp's learned JBU stack upsampler.

Reconstruction (same method as the other oracles in this directory) of the
`jbu_stack` upsampler the reference loads from torch.hub
(`vfm_reg/image_features.py:39-51`): four x2 JBULearnedRange stages + a
residual 1x1 fixup projection. Architecture per the public FeatUp repo
(mhamilton723/FeatUp, MIT; not vendored in /root/reference):

  * range kernel: guidance -> 1x1 conv -> GELU -> (Dropout) -> 1x1 conv keys;
    softmax over the (2r+1)^2 reflect-padded neighborhood of per-pixel
    key-query inner products, scaled by exp(range_temp) clamped at 1e4;
  * spatial kernel: Gaussian on a [-1, 1] x [-1, 1] window grid with learned
    sigma_spatial;
  * combined kernel normalized (clamp 1e-7) and applied to the bicubic
    (align_corners=False) x2-upsampled features;
  * stack: guidance adaptively average-pooled to (2h, 2w) per stage;
    output = fixup_proj(x) * 0.1 + x.

State-dict layout matches the hub checkpoint ('up1..up4.range_temp',
'up{i}.range_proj.{0,3}.*', 'up{i}.sigma_spatial', 'fixup_proj.1.*') so
`vfmreg_tpu.models.featup.load_featup_state_dict` consumes it unchanged.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class JBULearnedRange(nn.Module):
    def __init__(self, guidance_dim=3, feat_dim=32, key_dim=32, radius=3):
        super().__init__()
        self.radius = radius
        self.diameter = 2 * radius + 1
        self.key_dim = key_dim
        self.range_temp = nn.Parameter(torch.tensor(0.0))
        self.range_proj = nn.Sequential(
            nn.Conv2d(guidance_dim, key_dim, 1),
            nn.GELU(),
            nn.Dropout2d(0.1),
            nn.Conv2d(key_dim, key_dim, 1),
        )
        self.sigma_spatial = nn.Parameter(torch.tensor(1.0))

    def get_range_kernel(self, guidance):
        b, _, h, w = guidance.shape
        proj = self.range_proj(guidance)  # [B, K, H, W]
        proj_pad = F.pad(proj, [self.radius] * 4, mode="reflect")
        queries = (
            nn.Unfold(self.diameter)(proj_pad)
            .reshape(b, self.key_dim, self.diameter**2, h, w)
        )
        temp = self.range_temp.exp().clamp_max(1e4)
        logits = torch.einsum("bcphw,bchw->bphw", queries, proj)
        return F.softmax(temp * logits, dim=1)

    def get_spatial_kernel(self):
        lin = torch.linspace(-1, 1, self.diameter)
        y, x = torch.meshgrid(lin, lin, indexing="ij")
        d2 = x.square() + y.square()
        return torch.exp(-d2 / (2 * self.sigma_spatial**2)).reshape(
            1, self.diameter**2, 1, 1
        )

    def forward(self, source, guidance):
        b, _, gh, gw = guidance.shape
        kernel = self.get_range_kernel(guidance) * self.get_spatial_kernel()
        kernel = kernel / kernel.sum(1, keepdim=True).clamp(1e-7)  # [B, P, H, W]
        hr = nn.Upsample((gh, gw), mode="bicubic", align_corners=False)(source)
        hr_pad = F.pad(hr, [self.radius] * 4, mode="reflect")
        patches = (
            nn.Unfold(self.diameter)(hr_pad)
            .reshape(b, source.shape[1], self.diameter**2, gh, gw)
        )
        return torch.einsum("bcphw,bphw->bchw", patches, kernel)


class JBUStackOracle(nn.Module):
    def __init__(self, feat_dim):
        super().__init__()
        self.up1 = JBULearnedRange(feat_dim=feat_dim)
        self.up2 = JBULearnedRange(feat_dim=feat_dim)
        self.up3 = JBULearnedRange(feat_dim=feat_dim)
        self.up4 = JBULearnedRange(feat_dim=feat_dim)
        self.fixup_proj = nn.Sequential(
            nn.Dropout2d(0.2), nn.Conv2d(feat_dim, feat_dim, 1)
        )

    def forward(self, source, guidance):
        x = source
        for up in (self.up1, self.up2, self.up3, self.up4):
            _, _, h, w = x.shape
            g = F.adaptive_avg_pool2d(guidance, (2 * h, 2 * w))
            x = up(x, g)
        return self.fixup_proj(x) * 0.1 + x
