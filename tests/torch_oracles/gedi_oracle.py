"""Torch oracle of the GeDi PointNet2Feature network.

Reconstructed from `/root/reference/src/vfm-reg/src/gedi/gedi.py:12-129`
(qnet quaternion canonicalizer + 3 PointNet++ SSG set-abstraction modules +
FC head) and the vendored pointnet2_ops semantics:
  * FPS: starts at index 0, `mag <= 1e-3` near-origin skip
    (`_ext-src/src/sampling_gpu.cu:85-111`);
  * ball query: first nsample with d2 < r^2 in index order, empty slots
    pre-filled with the first in-radius index (`ball_query_gpu.cu:27-41`);
  * shared MLPs: Sequential [Conv2d(bias=False), BatchNorm2d, ReLU]
    (`pointnet2_modules.py:9-18`), grouping concat [xyz; features]
    (`pointnet2_utils.py:319-336`).
The quaternion -> rotation path replaces torchgeometry (unavailable) with the
equivalent direct (w, x, y, z) unit-quaternion rotation matrix.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def fps_cpu(xyz, npoint):
    """[B, N, 3] -> [B, npoint] per the CUDA kernel (incl. near-origin skip)."""
    b, n, _ = xyz.shape
    idx = torch.zeros(b, npoint, dtype=torch.long)
    temp = torch.full((b, n), 1e10)
    eligible = (xyz * xyz).sum(-1) > 1e-3
    last = torch.zeros(b, dtype=torch.long)
    for j in range(1, npoint):
        ref = xyz[torch.arange(b), last]
        d = ((xyz - ref[:, None]) ** 2).sum(-1)
        temp = torch.minimum(temp, d)
        scored = torch.where(eligible, temp, torch.tensor(-1.0))
        last = scored.argmax(-1)
        idx[:, j] = last
    return idx


def ball_query_cpu(radius, nsample, xyz, new_xyz):
    """[B, N, 3], [B, S, 3] -> [B, S, nsample] per the CUDA kernel."""
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    out = torch.zeros(b, s, nsample, dtype=torch.long)
    r2 = radius * radius
    for bi in range(b):
        d2 = ((new_xyz[bi][:, None] - xyz[bi][None]) ** 2).sum(-1)  # [S, N]
        for si in range(s):
            hits = torch.nonzero(d2[si] < r2).flatten()
            if len(hits):
                out[bi, si, :] = hits[0]
                k = min(nsample, len(hits))
                out[bi, si, :k] = hits[:k]
    return out


def _shared_mlp(spec):
    layers = []
    for i in range(1, len(spec)):
        layers += [nn.Conv2d(spec[i - 1], spec[i], 1, bias=False), nn.BatchNorm2d(spec[i]), nn.ReLU()]
    return nn.Sequential(*layers)


class _SA(nn.Module):
    def __init__(self, spec, npoint=None, radius=None, nsample=None):
        super().__init__()
        self.mlps = nn.ModuleList([_shared_mlp(spec)])
        self.npoint, self.radius, self.nsample = npoint, radius, nsample

    def forward(self, xyz, features):  # xyz [B, N, 3], features [B, C, N]|None
        if self.npoint is None:
            grouped = xyz.transpose(1, 2).unsqueeze(2)  # [B, 3, 1, N]
            if features is not None:
                grouped = torch.cat([grouped, features.unsqueeze(2)], dim=1)
            new_xyz = None
        else:
            fidx = fps_cpu(xyz, self.npoint)
            new_xyz = torch.stack([xyz[i][fidx[i]] for i in range(xyz.shape[0])])
            idx = ball_query_cpu(self.radius, self.nsample, xyz, new_xyz)
            gx = torch.stack([xyz[i][idx[i]] for i in range(xyz.shape[0])])  # [B,S,k,3]
            grouped = (gx - new_xyz[:, :, None]).permute(0, 3, 1, 2)  # [B,3,S,k]
            if features is not None:
                gf = torch.stack([features[i][:, idx[i]] for i in range(xyz.shape[0])])
                grouped = torch.cat([grouped, gf], dim=1)
        h = self.mlps[0](grouped)
        return new_xyz, F.max_pool2d(h, kernel_size=[1, h.shape[3]]).squeeze(-1)


class _QNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Sequential(nn.Conv1d(3, 256, 1, bias=False), nn.BatchNorm1d(256), nn.ReLU())
        self.conv2 = nn.Sequential(nn.Conv1d(256, 512, 1, bias=False), nn.BatchNorm1d(512), nn.ReLU())
        self.conv3 = nn.Sequential(nn.Conv1d(512, 1024, 1, bias=False), nn.BatchNorm1d(1024))
        self.fc1 = nn.Sequential(nn.Linear(1024, 512, bias=False), nn.BatchNorm1d(512), nn.ReLU())
        self.fc2 = nn.Sequential(nn.Linear(512, 256, bias=False), nn.BatchNorm1d(256), nn.ReLU())
        self.fc3 = nn.Linear(256, 4)

    def forward(self, x):  # [B, 3, N]
        h = self.conv3(self.conv2(self.conv1(x)))
        h = torch.max(h, 2)[0]
        q = self.fc3(self.fc2(self.fc1(h)))
        q = q + torch.tensor([1.0, 0, 0, 0])
        return F.normalize(q, p=2, dim=1)


def quat_to_rotmat(q):  # (w, x, y, z) unit quaternions -> [B, 3, 3]
    w, x, y, z = q.unbind(-1)
    return torch.stack([
        torch.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
        torch.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
        torch.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
    ], -2)


class GeDiOracle(nn.Module):
    def __init__(self, dim=32):
        super().__init__()
        self.qnet = _QNet()
        self.samodule1 = _SA([3, 128, 128, 128], npoint=128, radius=0.2, nsample=32)
        self.samodule2 = _SA([128 + 3, 256, 256, 256], npoint=64, radius=0.4, nsample=16)
        self.samodule3 = _SA([256 + 3, 512, 512, 1024])
        self.fc_layer = nn.Sequential(
            nn.Linear(1024, 512, bias=False), nn.BatchNorm1d(512), nn.ReLU(),
            nn.Linear(512, 256, bias=False), nn.BatchNorm1d(256), nn.ReLU(),
            nn.Dropout(0.3), nn.Linear(256, dim),
        )

    def forward(self, pc):  # [B, 3, N]
        rot = quat_to_rotmat(self.qnet(pc))
        pc = rot @ pc
        xyz = pc.transpose(1, 2).contiguous()
        xyz, feat = self.samodule1(xyz, None)
        xyz, feat = self.samodule2(xyz, feat)
        _, feat = self.samodule3(xyz, feat)
        return F.normalize(self.fc_layer(feat.squeeze(-1)), p=2, dim=1)
