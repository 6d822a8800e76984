"""Torch oracle of the PointDSC NonLocal encoder + confidence head.

Reconstructed from `/root/reference/src/vfm-reg/src/pointdsc/PointDSC.py:9-80`
(NonLocalBlock / NonLocalNet) and the classification MLP (`:113-119`). The
module/key names reproduce the `model_best.pkl` layout
(`encoder.blocks.PointCN_layer_i.*`, `...NonLocal_layer_i.fc_message.*`,
`classification.*`).
"""

import torch
import torch.nn as nn


class _NonLocal(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.fc_message = nn.Sequential(
            nn.Conv1d(c, c // 2, 1), nn.BatchNorm1d(c // 2), nn.ReLU(),
            nn.Conv1d(c // 2, c // 2, 1), nn.BatchNorm1d(c // 2), nn.ReLU(),
            nn.Conv1d(c // 2, c, 1),
        )
        self.projection_q = nn.Conv1d(c, c, 1)
        self.projection_k = nn.Conv1d(c, c, 1)
        self.projection_v = nn.Conv1d(c, c, 1)
        self.c = c

    def forward(self, feat, attention):  # feat [B, C, N]
        q = self.projection_q(feat)
        k = self.projection_k(feat)
        v = self.projection_v(feat)
        logits = torch.einsum("bco,bci->boi", q, k) / self.c**0.5
        w = torch.softmax(attention * logits, dim=-1)
        msg = torch.einsum("boi,bci->bco", w, v)
        return feat + self.fc_message(msg)


class PointDSCEncoderOracle(nn.Module):
    """`NonLocalNet` (single head) + the confidence MLP, eval mode."""

    def __init__(self, in_dim=6, num_layers=12, c=128):
        super().__init__()
        self.num_layers = num_layers

        class _Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.layer0 = nn.Conv1d(in_dim, c, 1)
                self.blocks = nn.ModuleDict()
                for i in range(num_layers):
                    self.blocks[f"PointCN_layer_{i}"] = nn.Sequential(
                        nn.Conv1d(c, c, 1), nn.BatchNorm1d(c), nn.ReLU()
                    )
                    self.blocks[f"NonLocal_layer_{i}"] = _NonLocal(c)

        self.encoder = _Enc()
        self.classification = nn.Sequential(
            nn.Conv1d(c, 32, 1), nn.ReLU(), nn.Conv1d(32, 32, 1), nn.ReLU(),
            nn.Conv1d(32, 1, 1),
        )
        self.sigma = nn.Parameter(torch.ones(1))

    def forward(self, corr_feat, compat):  # [B, in_dim, N], [B, N, N]
        feat = self.encoder.layer0(corr_feat)
        for i in range(self.num_layers):
            feat = self.encoder.blocks[f"PointCN_layer_{i}"](feat)
            feat = self.encoder.blocks[f"NonLocal_layer_{i}"](feat, compat)
        return feat, self.classification(feat)[:, 0]
