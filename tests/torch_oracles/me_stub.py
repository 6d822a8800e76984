"""Minimal MinkowskiEngine stand-in for executing the REFERENCE's model code.

MinkowskiEngine is unavailable in this image; this module implements just
enough of its v0.5 API (the surface `fcgf/fcgf.py` and `gcl/model/*` touch)
to run the reference's OWN ResUNet Python code on CPU, with the sparse-conv
semantics transcribed from the ME sources (same contract the brute-force
oracle in `me_resunet_oracle.py` documents):

  * kernel offsets enumerate the HYPER_CUBE [-r, r]^3 odometer-style, last
    axis fastest (`src/kernel_region.hpp`);
  * forward conv: out[y] = sum_k W[k] @ in[y + o_k * s_in], offsets in
    input-tensor-stride units;
  * stride-2 conv coordinates: unique(floor(c / 2s) * 2s), first-occurrence
    order (`coordinate_map_cpu.hpp`); the result is cached per tensor stride
    in the CoordinateManager;
  * transposed conv maps onto the CACHED finer-level coordinates:
    out[y] += W[k] @ in[y - o_k * s_out], offsets in output-stride units;
  * parameters mirror the checkpoint layout: conv `kernel` is
    [K, C_in, C_out] ([C_in, C_out] for kernel-size-1), MinkowskiBatchNorm
    nests a BatchNorm1d under `.bn`.

Evaluation is exact brute-force dict lookup — slow, fine for fixtures.
Install with `install(sys.modules)` BEFORE importing the reference model
modules.
"""

import enum

import torch
import torch.nn as nn
import torch.nn.functional as F


class RegionType(enum.Enum):
    HYPER_CUBE = 0
    HYPER_CROSS = 1


class KernelGenerator:
    def __init__(self, kernel_size=3, stride=1, dilation=1, is_transpose=False,
                 region_type=RegionType.HYPER_CUBE, dimension=3):
        assert region_type == RegionType.HYPER_CUBE, "only HYPER_CUBE is used"
        self.kernel_size = kernel_size
        self.stride = stride


class _CoordinateManager:
    def __init__(self):
        self.maps = {}  # tensor_stride -> list of int 3-tuples


class SparseTensor:
    def __init__(self, features, coordinates=None, tensor_stride=1,
                 coordinate_map_key=None, coordinate_manager=None, **_):
        self.F = features
        if coordinate_map_key is not None:
            # reference final-normalize path: reuse key (= coords) + manager
            self.coords = coordinate_map_key
            self._man = coordinate_manager
            self.tensor_stride = tensor_stride
        else:
            if torch.is_tensor(coordinates):
                c = coordinates.numpy()
                if c.shape[1] == 4:  # leading batch column
                    c = c[:, 1:]
                self.coords = [tuple(int(v) for v in row) for row in c]
            else:
                self.coords = [tuple(int(v) for v in row) for row in coordinates]
            self._man = _CoordinateManager()
            self._man.maps[tensor_stride] = self.coords
            self.tensor_stride = tensor_stride

    @property
    def coordinate_map_key(self):
        return self.coords

    @property
    def coordinate_manager(self):
        return self._man

    def _like(self, feats):
        out = SparseTensor(feats, coordinate_map_key=self.coords,
                           coordinate_manager=self._man,
                           tensor_stride=self.tensor_stride)
        return out

    def __add__(self, other):
        assert self.coords is other.coords or self.coords == other.coords
        return self._like(self.F + other.F)

    __iadd__ = __add__


def _cube_offsets(kernel_size):
    r = (kernel_size - 1) // 2
    rng = range(-r, r + 1)
    return [(i, j, k) for i in rng for j in rng for k in rng]


def _stride_down(coords, tensor_stride):
    s = 2 * tensor_stride
    seen, out = set(), []
    for c in coords:
        f = tuple((v // s) * s for v in c)  # python // floors negatives
        if f not in seen:
            seen.add(f)
            out.append(f)
    return out


def _conv_bruteforce(coords_in, feats_in, coords_out, kernel, offset_units,
                     kernel_size, transpose):
    lut = {c: i for i, c in enumerate(coords_in)}
    kern = kernel if kernel.dim() == 3 else kernel[None]
    out = feats_in.new_zeros(len(coords_out), kern.shape[-1])
    sign = -1 if transpose else 1
    for k, o in enumerate(_cube_offsets(kernel_size)):
        d = (sign * o[0] * offset_units, sign * o[1] * offset_units,
             sign * o[2] * offset_units)
        for yi, y in enumerate(coords_out):
            xi = lut.get((y[0] + d[0], y[1] + d[1], y[2] + d[2]))
            if xi is not None:
                out[yi] += feats_in[xi] @ kern[k]
    return out


class MinkowskiConvolution(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 dilation=1, bias=False, dimension=3, kernel_generator=None,
                 **_):
        super().__init__()
        assert dilation == 1 and dimension == 3
        if kernel_generator is not None:
            kernel_size = kernel_generator.kernel_size
            stride = kernel_generator.stride
        k = kernel_size**3
        self.kernel = nn.Parameter(
            torch.zeros(k, in_channels, out_channels) if k > 1
            else torch.zeros(in_channels, out_channels))
        self.bias = nn.Parameter(torch.zeros(1, out_channels)) if bias else None
        self.kernel_size = kernel_size
        self.stride = stride
        self.transpose = False

    def _out_coords(self, x):
        s_in = x.tensor_stride
        if self.transpose:
            assert self.stride == 2
            s_out = s_in // 2
            return x.coordinate_manager.maps[s_out], s_out, s_out
        if self.stride == 2:
            s_out = 2 * s_in
            man = x.coordinate_manager
            if s_out not in man.maps:
                man.maps[s_out] = _stride_down(x.coords, s_in)
            return man.maps[s_out], s_out, s_in
        return x.coords, s_in, s_in

    def forward(self, x):
        coords_out, s_out, offset_units = self._out_coords(x)
        feats = _conv_bruteforce(x.coords, x.F, coords_out, self.kernel,
                                 offset_units, self.kernel_size, self.transpose)
        if self.bias is not None:
            feats = feats + self.bias
        out = SparseTensor(feats, coordinate_map_key=coords_out,
                           coordinate_manager=x.coordinate_manager,
                           tensor_stride=s_out)
        return out


class MinkowskiConvolutionTranspose(MinkowskiConvolution):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.transpose = True


class MinkowskiBatchNorm(nn.Module):
    def __init__(self, num_features, eps=1e-5, momentum=0.1):
        super().__init__()
        self.bn = nn.BatchNorm1d(num_features, eps=eps, momentum=momentum)

    def forward(self, x):
        return x._like(self.bn(x.F))


class MinkowskiReLU(nn.Module):
    def forward(self, x):
        return x._like(F.relu(x.F))


class MinkowskiNetwork(nn.Module):
    def __init__(self, D):
        super().__init__()
        self.D = D


def cat(*tensors):
    base = tensors[0]
    return base._like(torch.cat([t.F for t in tensors], dim=1))


class _Functional:
    @staticmethod
    def relu(x):
        return x._like(F.relu(x.F))


def install(modules):
    """Register this stub as `MinkowskiEngine` (+ `.MinkowskiFunctional`) in
    the given sys.modules dict."""
    import sys as _sys
    import types

    me = _sys.modules.get("MinkowskiEngine")
    if me is not None and getattr(me, "_vfmreg_stub", False):
        return
    mod = types.ModuleType("MinkowskiEngine")
    for name in ("RegionType", "KernelGenerator", "SparseTensor",
                 "MinkowskiConvolution", "MinkowskiConvolutionTranspose",
                 "MinkowskiBatchNorm", "MinkowskiReLU", "MinkowskiNetwork",
                 "cat"):
        setattr(mod, name, globals()[name])
    mod._vfmreg_stub = True
    fun = types.ModuleType("MinkowskiEngine.MinkowskiFunctional")
    fun.relu = _Functional.relu
    mod.MinkowskiFunctional = fun
    modules["MinkowskiEngine"] = mod
    modules["MinkowskiEngine.MinkowskiFunctional"] = fun
