"""Torch oracle of the DIP PointNetFeature network.

Reconstructed from `/root/reference/src/vfm-reg/src/dip/network.py:6-96`
(STN3d T-net + 3x Conv1d/BN/ReLU -> max-pool -> 3x FC, L2-normalized output).
The Sequential member order reproduces the checkpoint key layout
(`conv1.0.weight`, `fc2.2.running_mean`, ...): the main tower's fc2 carries a
Dropout between the Linear and its BatchNorm, the STN's does not.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def _cbr(n_in, n_out):
    return nn.Sequential(nn.Conv1d(n_in, n_out, 1), nn.BatchNorm1d(n_out), nn.ReLU())


class _Tower(nn.Module):
    """Shared conv/max/fc trunk of STN3d and PointNetFeature."""

    def __init__(self, out_dim, dropout_in_fc2):
        super().__init__()
        self.conv1 = _cbr(3, 256)
        self.conv2 = _cbr(256, 512)
        self.conv3 = nn.Sequential(nn.Conv1d(512, 1024, 1), nn.BatchNorm1d(1024))
        self.fc1 = nn.Sequential(nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU())
        fc2 = [nn.Linear(512, 256)]
        if dropout_in_fc2:
            fc2.append(nn.Dropout(p=0.3))
        fc2 += [nn.BatchNorm1d(256), nn.ReLU()]
        self.fc2 = nn.Sequential(*fc2)
        self.fc3 = nn.Sequential(nn.Linear(256, out_dim))

    def forward(self, x):  # x: [B, 3, N]
        h = self.conv3(self.conv2(self.conv1(x)))
        h = torch.max(h, 2)[0]
        return self.fc3(self.fc2(self.fc1(h)))


class DIPOracle(nn.Module):
    def __init__(self, dim=32):
        super().__init__()
        self.stn3d = _Tower(9, dropout_in_fc2=False)
        self.tower = _Tower(dim, dropout_in_fc2=True)

    def state_dict_reference_keys(self):
        """Rename `tower.*` to the reference's top-level names."""
        out = {}
        for k, v in self.state_dict().items():
            out[k[len("tower."):] if k.startswith("tower.") else k] = v
        return out

    def forward(self, x):  # x: [B, 3, N] patches
        eye = torch.eye(3, dtype=x.dtype).reshape(1, 3, 3)
        trans = self.stn3d(x).reshape(-1, 3, 3) + eye
        xt = torch.bmm(trans, x)
        return F.normalize(self.tower(xt), p=2, dim=1)
