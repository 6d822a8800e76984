"""Converter parity against goldens captured from the REFERENCE's own torch
modules (VERDICT r2 item 4).

The fixtures in `tests/golden/` were produced by
`tests/torch_oracles/gen_reference_goldens.py` running the reference repo's
actual model code (`pointdsc/PointDSC.py`, `dip/network.py`,
`spinnet/model.py` + `ThreeDCCN.py`, `gedi/gedi.py` + its pointnet2_modules,
`fcgf/fcgf.py` + `gcl/model/resunet.py` over the `me_stub` ME stand-in) on
CPU with seeded random weights — not a hand reconstruction. These tests load
the saved state dicts through our converters and assert the JAX forwards
reproduce the reference activations. All six learned-descriptor families are
covered; for FCGF/GCL the network WIRING comes from the real source while
the sparse-conv kernel semantics remain the ME-source transcription
(`me_stub.py` / `me_resunet_oracle.py`). (Published checkpoints are
unreachable here: zero egress; `vfmreg-download-models --verify` covers them
when the network is available.)
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

GOLDEN = Path(__file__).parent / "golden"


def _load(name):
    path = GOLDEN / name
    if not path.exists():
        pytest.skip(f"golden fixture {name} not generated")
    data = np.load(path)
    sd = {k[4:]: data[k] for k in data.files if k.startswith("sd::")}
    rest = {k: data[k] for k in data.files if not k.startswith("sd::")}
    return sd, rest


def test_pointdsc_full_inference_matches_reference_module():
    """End-to-end PointDSC inference (encoder, confidence, NMS seeds, per-seed
    power iteration, weighted Procrustes, hypothesis selection, post
    refinement) against the reference `PointDSC.forward` with testing=True."""
    from vfmreg_tpu.models.pointdsc import load_pointdsc_state_dict, pointdsc_forward

    sd, g = _load("pointdsc_reference_golden.npz")
    params = load_pointdsc_state_dict(sd, num_layers=12)

    n = g["src"].shape[0]
    out = pointdsc_forward(
        params,
        jnp.asarray(g["corr_pos"]),
        jnp.asarray(g["src"]),
        jnp.asarray(g["tgt"]),
        jnp.ones(n, bool),
        sigma_d=1.2,
        nms_radius=0.6,
        inlier_threshold=0.10,
        num_iterations=10,
        k=40,
        ratio_num=int(n * 0.1),
        refine_iters=20,
    )
    np.testing.assert_allclose(
        np.asarray(out["final_trans"]), g["final_trans"], atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out["final_labels"]), g["final_labels"].astype(bool)
    )
    # the recovered motion matches the planted one (sanity of the fixture)
    np.testing.assert_allclose(out["final_trans"][:3, 3], g["gt_t"], atol=0.05)


def test_pointdsc_encoder_matches_reference_module():
    from vfmreg_tpu.models.pointdsc import load_pointdsc_state_dict, pointdsc_encode

    sd, g = _load("pointdsc_reference_golden.npz")
    params = load_pointdsc_state_dict(sd, num_layers=12)

    src, tgt = g["src"], g["tgt"]
    d_src = np.linalg.norm(src[:, None] - src[None], axis=-1)
    d_tgt = np.linalg.norm(tgt[:, None] - tgt[None], axis=-1)
    compat = np.clip(1.0 - (d_src - d_tgt) ** 2 / 1.2**2, 0.0, None)

    feat, conf = pointdsc_encode(params, jnp.asarray(g["corr_pos"]), jnp.asarray(compat))
    np.testing.assert_allclose(np.asarray(feat), g["encoder_feat"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(conf), g["confidence"], atol=2e-4)


def test_dip_network_matches_reference_module():
    """DIP PointNetFeature (STN3d T-net + conv towers + FC head + L2 norm)
    against the reference `dip/network.py` module."""
    from vfmreg_tpu.models.dip import dip_forward, load_dip_state_dict

    sd, g = _load("dip_reference_golden.npz")
    params = load_dip_state_dict(sd)

    patches = np.transpose(g["patches"], (0, 2, 1))  # ours takes [B, N, 3]
    out = dip_forward(params, jnp.asarray(patches))
    np.testing.assert_allclose(np.asarray(out), g["descriptors"], atol=1e-4)


def test_spinnet_trunk_matches_reference_module():
    """SpinNet learned trunk (xyz_raising + Cylindrical_Net with its
    cylindrical pad semantics) at the reference production dims
    (`descriptors.py:187`: rad 9 / ele 30 / azi 60) against the reference
    `spinnet/model.py:61-72` + `ThreeDCCN.py` modules, plus the pure-torch
    geometric helpers `var_to_invar` (`common.py:522-548`) and
    `get_voxel_coordinate` (`common.py:415-421`)."""
    from vfmreg_tpu.models.spinnet import (
        get_voxel_coordinate,
        load_spinnet_state_dict,
        spinnet_trunk,
        var_to_invar,
    )

    sd, g = _load("spinnet_reference_golden.npz")
    params = load_spinnet_state_dict(sd, dim=32)

    rad_n, azi_n, ele_n = 9, 60, 30
    rel = np.transpose(g["new_points"], (0, 2, 3, 1))  # [B, N, k, 3]
    got = np.asarray(spinnet_trunk(params, jnp.asarray(rel), rad_n, azi_n, ele_n))
    np.testing.assert_allclose(got, g["trunk_out"], atol=2e-4)

    got_v = np.asarray(var_to_invar(jnp.asarray(g["vpts"]), rad_n, azi_n, ele_n))
    np.testing.assert_allclose(got_v, g["var_to_invar_out"], atol=1e-5)

    # the reference returns [rad, ele*azi, 3]; ours is pre-flattened
    np.testing.assert_allclose(
        get_voxel_coordinate(2.0, rad_n, azi_n, ele_n), g["grid"].reshape(-1, 3),
        atol=1e-9,
    )


def test_gedi_network_matches_reference_module():
    """GeDi PointNet2Feature (qnet canonicalizer + 3 PointNet++ SSG SA
    modules + FC head + L2 norm) against the reference `gedi/gedi.py:12-129`
    modules — the SA stack is the reference's own pointnet2_modules Python
    code over CPU transcriptions of its CUDA kernels (see
    `gen_reference_goldens.gen_gedi`)."""
    from vfmreg_tpu.models.gedi import _qnet, gedi_forward, load_gedi_state_dict

    sd, g = _load("gedi_reference_golden.npz")
    params = load_gedi_state_dict(sd, dim=32)

    patches = np.transpose(g["patches"], (0, 2, 1))  # ours takes [B, N, 3]
    quat = np.asarray(_qnet(params["qnet"], jnp.asarray(patches)))
    np.testing.assert_allclose(quat, g["quat"], atol=1e-5)

    out = np.asarray(gedi_forward(params, jnp.asarray(patches)))
    np.testing.assert_allclose(out, g["descriptors"], atol=1e-4)


@pytest.mark.parametrize(
    "name,conv1_k,tr_channels",
    [("fcgf", 7, (64, 64, 64, 128)), ("gcl", 5, (128, 128, 128, 256))],
)
def test_sparse_resunet_matches_reference_module_wiring(name, conv1_k, tr_channels):
    """FCGF ResUNetBN2C / GCL ResUNetFatBN at the production configs
    (`vfm_reg/descriptors.py:89,154-160`) against goldens produced by the
    reference's OWN fcgf.py / gcl resunet.py module code running over the
    `me_stub` MinkowskiEngine stand-in — pins the network wiring (layer
    order, skip cats, relu placement, final L2 normalize) from the real
    source rather than a hand reconstruction."""
    from vfmreg_tpu.models.sparse_resunet import (
        ResUNetConfig,
        load_me_state_dict,
        resunet_forward,
    )

    sd, g = _load(f"{name}_reference_golden.npz")
    cfg = ResUNetConfig(
        in_channels=1, out_channels=32, channels=(32, 64, 128, 256),
        tr_channels=tr_channels, conv1_kernel_size=conv1_k,
        normalize_feature=True,
    )
    params = load_me_state_dict(sd, cfg)
    n = g["coords"].shape[0]
    got = np.asarray(
        resunet_forward(params, jnp.asarray(g["coords"]), jnp.asarray(g["feats"]),
                        jnp.ones((n,), bool), cfg)
    )
    np.testing.assert_allclose(got, g["descriptors"], atol=1e-4)
