"""Torch oracle of the MinkowskiEngine sparse ResUNet family (FCGF / GCL).

MinkowskiEngine is unavailable in this image, so the sparse-conv semantics are
hand-built from the ME v0.5 sources the checkpoints were trained with:

  * kernel offsets enumerate the HYPER_CUBE [-r, r]^3 with the LAST coordinate
    fastest — ME's `RegionIterator` increments the last axis first
    (`src/kernel_region.hpp`, odometer order), so
    index = ((ox+r)*e + (oy+r))*e + (oz+r);
  * forward conv: out[y] = sum_k W[k] @ in[y + o_k * s_in] (region around the
    OUTPUT coordinate in input-tensor-stride units);
  * stride-2 conv coordinates: unique(floor(c / 2s) * 2s) — floor division,
    negative coordinates round down (`coordinate_map_cpu.hpp` stride);
  * transposed conv onto the cached skip-level coordinate map: ME builds the
    transpose kernel map by swapping in/out of the forward map
    (`coordinate_map_manager` kernel_map with is_transpose), giving
    out[y] += W[k] @ in[x] where y = x + o_k * s_out;
  * weights are [K, C_in, C_out] named `kernel`; MinkowskiBatchNorm nests a
    BatchNorm1d under `.bn`; BasicBlockBN is conv1/norm1/relu/conv2/norm2 +
    residual, relu (`fcgf/fcgf.py:101-151`).

The brute-force dict-lookup evaluation is exact (no hashing collisions), so it
is the ground truth the JAX gather-based implementation must match.

Architecture reconstructed from `/root/reference/src/vfm-reg/src/fcgf/fcgf.py:
582-805` (ResUNetBN2C) and `gcl/model/resunet.py:8-274` (ResUNetFatBN).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def cube_offsets(kernel_size):
    r = (kernel_size - 1) // 2
    rng = range(-r, r + 1)
    return [(i, j, k) for i in rng for j in rng for k in rng]


class MEConv(nn.Module):
    """MinkowskiConvolution stand-in: param `kernel` [K, C_in, C_out]."""

    def __init__(self, c_in, c_out, kernel_size, bias=False):
        super().__init__()
        k = kernel_size**3
        self.kernel = nn.Parameter(torch.zeros(k, c_in, c_out) if k > 1 else torch.zeros(c_in, c_out))
        self.bias = nn.Parameter(torch.zeros(c_out)) if bias else None
        self.kernel_size = kernel_size

    def forward(self, coords_in, feats_in, coords_out, stride_units, transpose=False):
        lut = {tuple(c): i for i, c in enumerate(coords_in)}
        kern = self.kernel if self.kernel.dim() == 3 else self.kernel[None]
        out = feats_in.new_zeros(len(coords_out), kern.shape[-1])
        for k, o in enumerate(cube_offsets(self.kernel_size)):
            sign = -1 if transpose else 1
            d = (sign * o[0] * stride_units, sign * o[1] * stride_units, sign * o[2] * stride_units)
            for yi, y in enumerate(coords_out):
                x = (y[0] + d[0], y[1] + d[1], y[2] + d[2])
                xi = lut.get(x)
                if xi is not None:
                    out[yi] += feats_in[xi] @ kern[k]
        if self.bias is not None:
            out = out + self.bias
        return out


class MEBN(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.bn = nn.BatchNorm1d(c)

    def forward(self, x):
        return self.bn(x)


class MEBlock(nn.Module):
    """BasicBlockBN (`fcgf/fcgf.py:101-151`)."""

    def __init__(self, c):
        super().__init__()
        self.conv1 = MEConv(c, c, 3)
        self.norm1 = MEBN(c)
        self.conv2 = MEConv(c, c, 3)
        self.norm2 = MEBN(c)

    def forward(self, coords, feats, stride_units):
        h = F.relu(self.norm1(self.conv1(coords, feats, coords, stride_units)))
        h = self.norm2(self.conv2(coords, h, coords, stride_units))
        return F.relu(h + feats)


def stride_down(coords, stride_units):
    """unique(floor(c / 2s) * 2s), first-occurrence order."""
    s = 2 * stride_units
    seen, out = set(), []
    for c in coords:
        f = tuple((v // s) * s for v in c)  # python // floors negatives
        if f not in seen:
            seen.add(f)
            out.append(f)
    return out


class MEResUNetOracle(nn.Module):
    def __init__(self, in_ch=1, out_ch=32, channels=(32, 64, 128, 256),
                 tr_channels=(64, 64, 64, 128), conv1_kernel_size=7):
        super().__init__()
        C = (None,) + tuple(channels)
        T = (None,) + tuple(tr_channels)
        self.conv1 = MEConv(in_ch, C[1], conv1_kernel_size)
        self.norm1 = MEBN(C[1])
        self.block1 = MEBlock(C[1])
        for i in (2, 3, 4):
            setattr(self, f"conv{i}", MEConv(C[i - 1], C[i], 3))
            setattr(self, f"norm{i}", MEBN(C[i]))
            setattr(self, f"block{i}", MEBlock(C[i]))
        self.conv4_tr = MEConv(C[4], T[4], 3)
        self.norm4_tr = MEBN(T[4])
        self.block4_tr = MEBlock(T[4])
        self.conv3_tr = MEConv(C[3] + T[4], T[3], 3)
        self.norm3_tr = MEBN(T[3])
        self.block3_tr = MEBlock(T[3])
        self.conv2_tr = MEConv(C[2] + T[3], T[2], 3)
        self.norm2_tr = MEBN(T[2])
        self.block2_tr = MEBlock(T[2])
        self.conv1_tr = MEConv(C[1] + T[2], T[1], 1)
        self.final = MEConv(T[1], out_ch, 1, bias=True)

    def forward(self, coords, feats):
        """coords: list of int 3-tuples (stride 1); feats: [N, C_in] tensor."""
        lv = [coords]
        for s in (1, 2, 4):
            lv.append(stride_down(lv[-1], s))

        def enc(i, f_in, ci, co, s):
            conv = getattr(self, f"conv{i}")
            h = getattr(self, f"norm{i}")(conv(ci, f_in, co, s))
            h = getattr(self, f"block{i}")(co, h, s * (2 if i > 1 else 1))
            return h, F.relu(h)

        s1, out = enc(1, feats, lv[0], lv[0], 1)
        s2, out = enc(2, out, lv[0], lv[1], 1)
        s4, out = enc(3, out, lv[1], lv[2], 2)
        s8, out = enc(4, out, lv[2], lv[3], 4)

        def dec(i, f_in, ci, co, s_out, skip):
            conv = getattr(self, f"conv{i}_tr")
            h = conv(ci, f_in, co, s_out, transpose=True)
            h = getattr(self, f"norm{i}_tr")(h)
            h = getattr(self, f"block{i}_tr")(co, h, s_out)
            return torch.cat([F.relu(h), skip], dim=1)

        out = dec(4, out, lv[3], lv[2], 4, s4)
        out = dec(3, out, lv[2], lv[1], 2, s2)
        out = dec(2, out, lv[1], lv[0], 1, s1)
        out = F.relu(self.conv1_tr(lv[0], out, lv[0], 1))
        out = self.final(lv[0], out, lv[0], 1)
        return out / (torch.norm(out, p=2, dim=1, keepdim=True) + 1e-8)
