"""Torch oracle of the SpinNet learned trunk.

Reconstructed from `/root/reference/src/vfm-reg/src/spinnet/ThreeDCCN.py:23-97`
(Cylindrical_Net: 4x Conv3d then 7 dilated Conv2d with circular-azimuth /
zero-elevation padding, non-affine BatchNorms) and `model.py:22-72`
(xyz_raising 1x1 conv + BN + ReLU + sample max-pool). Checkpoint key layout:
`xyz_raising.*`, `bn_xyz_raising.*`, `conv_net.ops.{i}.*`.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def _wrap_pad_2d(x, eff_k):
    """Circular pad on azimuth (last dim), zero pad on elevation
    (`common.py:295-317`). Handles both parities of the effective kernel."""
    if eff_k % 2 == 0:
        p = eff_k // 2
        x = torch.cat([x, x[..., :p]], dim=-1)
        z = torch.zeros(x.shape[:-2] + (p, x.shape[-1]), dtype=x.dtype)
        return torch.cat([x, z], dim=-2)
    p = (eff_k - 1) // 2
    x = torch.cat([x[..., -p:], x, x[..., :p]], dim=-1)
    z = torch.zeros(x.shape[:-2] + (p, x.shape[-1]), dtype=x.dtype)
    return torch.cat([z, x, z], dim=-2)


class SpinNetTrunkOracle(nn.Module):
    def __init__(self, dim=32):
        super().__init__()
        self.xyz_raising = nn.Conv2d(3, 16, 1)
        self.bn_xyz_raising = nn.BatchNorm2d(16)

        class _CNet(nn.Module):
            def __init__(self):
                super().__init__()
                ops = nn.ModuleList()
                cur, dil = 16, 1
                for out in (32, 32, 64, 64):  # Conv3d block, d=1 throughout
                    ops += [nn.Conv3d(cur, out, 3), nn.BatchNorm3d(out, affine=False), nn.ReLU()]
                    cur = out
                # (out, k, stride, relu, bn): stride accumulates into dilation
                for out, k, st, relu, bn in (
                    (128, 3, 2, True, True), (128, 3, 1, True, True),
                    (64, 3, 2, True, True), (64, 3, 1, True, True),
                    (32, 2, 2, False, True), (32, 2, 2, False, True),
                    (dim, 2, 2, False, False),
                ):
                    ops.append(nn.Conv2d(cur, out, k, dilation=dil))
                    dil *= st
                    if bn:
                        ops.append(nn.BatchNorm2d(out, affine=False))
                    if relu:
                        ops.append(nn.ReLU())
                    cur = out
                self.ops = ops

            def forward(self, x):
                for op in self.ops:
                    if hasattr(op, "kernel_size"):
                        if len(op.kernel_size) == 3:
                            x = _wrap_pad_2d(x, op.kernel_size[1])
                        else:
                            if x.dim() == 5:
                                x = x.squeeze(2)
                            k, d = op.kernel_size[0], op.dilation[0]
                            x = _wrap_pad_2d(x, k + (k - 1) * (d - 1))
                    x = op(x)
                return x

        self.conv_net = _CNet()

    def forward(self, new_points, rad_n, ele_n, azi_n):
        """new_points: [B, 3, npoint, nsample] grouped azimuth-aligned coords."""
        x = F.relu(self.bn_xyz_raising(self.xyz_raising(new_points)))
        x = F.max_pool2d(x, kernel_size=(1, x.shape[3])).squeeze(3)
        x = x.view(x.shape[0], x.shape[1], rad_n, ele_n, azi_n)
        x = self.conv_net(x)
        return F.max_pool2d(x, kernel_size=(x.shape[2], x.shape[3]))[:, :, 0, 0]
