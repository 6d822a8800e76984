"""Golden torch-parity fixtures for the learned-descriptor converters.

Each test instantiates the reference architecture in torch (reconstructed
oracle under `tests/torch_oracles/`, eval mode, seeded weights AND BatchNorm
running stats), converts its state_dict through the shipped converter, and
asserts the JAX forward matches the torch forward. This pins the
checkpoint-conversion contract of every learned baseline (VERDICT r1 item 3).
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.torch_oracles import randomize_module


def test_dip_converter_parity():
    """DIP PointNetFeature: torch forward == JAX forward after conversion
    (reference `dip/network.py:48-113`)."""
    from tests.torch_oracles.dip_oracle import DIPOracle
    from vfmreg_tpu.models.dip import dip_forward, load_dip_state_dict

    net = randomize_module(DIPOracle(dim=32), seed=7)
    rng = np.random.RandomState(0)
    patches = rng.normal(size=(6, 3, 64)).astype(np.float32)

    with torch.no_grad():
        want = net(torch.from_numpy(patches)).numpy()

    sd = {k: v.numpy() for k, v in net.state_dict_reference_keys().items()}
    params = load_dip_state_dict(sd, dim=32)
    got = np.asarray(dip_forward(params, np.transpose(patches, (0, 2, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pointdsc_converter_parity():
    """PointDSC NonLocal encoder + confidence: torch == JAX after conversion
    (reference `pointdsc/PointDSC.py:9-80,113-119`)."""
    from tests.torch_oracles.pointdsc_oracle import PointDSCEncoderOracle
    from vfmreg_tpu.models.pointdsc import load_pointdsc_state_dict, pointdsc_encode

    net = randomize_module(PointDSCEncoderOracle(num_layers=3), seed=11)
    rng = np.random.RandomState(1)
    n = 48
    corr = rng.normal(size=(1, 6, n)).astype(np.float32)
    compat = np.clip(rng.normal(size=(1, n, n)), 0, None).astype(np.float32)

    with torch.no_grad():
        feat_t, conf_t = net(torch.from_numpy(corr), torch.from_numpy(compat))

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = load_pointdsc_state_dict(sd, num_layers=3)
    feat_j, conf_j = pointdsc_encode(params, corr[0].T, compat[0])
    np.testing.assert_allclose(np.asarray(feat_j), feat_t[0].numpy().T, atol=1e-4)
    np.testing.assert_allclose(np.asarray(conf_j), conf_t[0].numpy(), atol=1e-4)


def test_spinnet_converter_parity():
    """SpinNet trunk (xyz_raising + Cylindrical_Net): torch == JAX after
    conversion (reference `spinnet/ThreeDCCN.py:23-97`, `model.py:60-72`)."""
    from tests.torch_oracles.spinnet_oracle import SpinNetTrunkOracle
    from vfmreg_tpu.models.spinnet import load_spinnet_state_dict, spinnet_trunk

    rad_n, ele_n, azi_n, ns = 9, 10, 20, 4
    net = randomize_module(SpinNetTrunkOracle(dim=32), seed=3)
    rng = np.random.RandomState(2)
    grouped = rng.normal(size=(2, 3, rad_n * ele_n * azi_n, ns)).astype(np.float32)

    with torch.no_grad():
        want = net(torch.from_numpy(grouped), rad_n, ele_n, azi_n).numpy()

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = load_spinnet_state_dict(sd, dim=32)
    rel = np.transpose(grouped, (0, 2, 3, 1))  # [B, N, k, 3]
    got = np.asarray(spinnet_trunk(params, rel, rad_n, azi_n, ele_n))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gedi_converter_parity():
    """GeDi PointNet2Feature (qnet + 3 SA modules + FC head): torch == JAX
    after conversion (reference `gedi/gedi.py:12-129` + vendored
    pointnet2_ops CUDA semantics)."""
    from tests.torch_oracles.gedi_oracle import GeDiOracle
    from vfmreg_tpu.models.gedi import gedi_forward, load_gedi_state_dict

    net = randomize_module(GeDiOracle(dim=32), seed=5)
    rng = np.random.RandomState(4)
    patches = rng.normal(size=(2, 3, 256)).astype(np.float32) * 0.5

    with torch.no_grad():
        want = net(torch.from_numpy(patches)).numpy()

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = load_gedi_state_dict(sd, dim=32)
    got = np.asarray(gedi_forward(params, np.transpose(patches, (0, 2, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fcgf_gcl_sparse_resunet_converter_parity():
    """Sparse ResUNet (FCGF/GCL family): JAX gather-based forward == the
    brute-force ME-semantics torch oracle after conversion. Settles the ME
    kernel-offset order, the stride-2 coordinate floor rule, and the
    transposed-conv connection direction (`ops/sparse_conv.py` contract)."""
    from tests.torch_oracles.me_resunet_oracle import MEResUNetOracle
    from vfmreg_tpu.models.sparse_resunet import (
        ResUNetConfig,
        load_me_state_dict,
        resunet_forward,
    )

    channels, tr = (8, 16, 16, 16), (8, 8, 8, 16)
    net = randomize_module(
        MEResUNetOracle(in_ch=1, out_ch=8, channels=channels, tr_channels=tr,
                        conv1_kernel_size=5),
        seed=13,
    )
    rng = np.random.RandomState(6)
    coords = np.unique(rng.randint(-8, 9, size=(200, 3)).astype(np.int32), axis=0)
    n = coords.shape[0]
    feats = rng.normal(size=(n, 1)).astype(np.float32)

    with torch.no_grad():
        want = net([tuple(int(v) for v in c) for c in coords], torch.from_numpy(feats)).numpy()

    cfg = ResUNetConfig(in_channels=1, out_channels=8, channels=channels,
                        tr_channels=tr, conv1_kernel_size=5, normalize_feature=True)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = load_me_state_dict(sd, cfg)
    got = np.asarray(
        resunet_forward(params, jnp.asarray(coords), jnp.asarray(feats),
                        jnp.ones((n,), bool), cfg)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_featup_jbu_stack_converter_parity():
    """FeatUp learned JBU stack (the `use_featup=True` upsampler the reference
    loads from torch.hub, `image_features.py:39-51`): torch oracle forward ==
    JAX `jbu_stack_upsample` after `load_featup_state_dict` conversion
    (VERDICT r2 item 7 — the last weight-bearing model path gets a numeric
    parity oracle)."""
    import jax.numpy as jnp

    from tests.torch_oracles.featup_oracle import JBUStackOracle
    from vfmreg_tpu.models.featup import jbu_stack_upsample, load_featup_state_dict

    d = 16
    model = JBUStackOracle(feat_dim=d)
    randomize_module(model, seed=11)
    with torch.no_grad():
        for up in (model.up1, model.up2, model.up3, model.up4):
            up.range_temp.fill_(0.3)
            up.sigma_spatial.fill_(1.1)
    model.eval()

    g = torch.Generator().manual_seed(5)
    src = torch.randn(1, d, 4, 5, generator=g)
    guide = torch.rand(1, 3, 64, 80, generator=g)
    with torch.no_grad():
        want = model(src, guide)[0].permute(1, 2, 0).numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = load_featup_state_dict(sd)
    got = jbu_stack_upsample(
        params,
        jnp.asarray(src[0].permute(1, 2, 0).numpy()),
        jnp.asarray(guide[0].permute(1, 2, 0).numpy()),
    )
    assert got.shape == want.shape == (64, 80, d)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
