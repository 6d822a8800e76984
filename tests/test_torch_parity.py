"""Golden torch-parity fixtures for the learned-descriptor converters.

Each test instantiates the reference architecture in torch (reconstructed
oracle under `tests/torch_oracles/`, eval mode, seeded weights AND BatchNorm
running stats), converts its state_dict through the shipped converter, and
asserts the JAX forward matches the torch forward. This pins the
checkpoint-conversion contract of every learned baseline (VERDICT r1 item 3).
"""

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
