"""Validate the 50 shipped benchmark scene-spec JSONs (reference component #1).

The specs under `data/{nclt,robotcar}/scene_*.json` are the published
benchmark's exact scene selection (reference `data/nclt/scene_000.json` etc.,
consumed at `prepare_scenes.py:123-166`). They are data configuration, shipped
verbatim; this test pins that all 50 load and pass the schema validator.
"""

from pathlib import Path

import numpy as np
import pytest

from vfmreg_tpu.data.scene import load_scene_spec

REPO_ROOT = Path(__file__).resolve().parent.parent
SCENE_FILES = sorted((REPO_ROOT / "data").glob("*/scene_*.json"))


def test_fifty_specs_shipped():
    nclt = [p for p in SCENE_FILES if p.parent.name == "nclt"]
    robotcar = [p for p in SCENE_FILES if p.parent.name == "robotcar"]
    assert len(nclt) == 25
    assert len(robotcar) == 25


@pytest.mark.parametrize("path", SCENE_FILES, ids=lambda p: f"{p.parent.name}/{p.stem}")
def test_spec_validates(path):
    spec = load_scene_spec(path)  # raises on schema violation
    m = spec["mapping"]
    assert len(m["point_clouds"]) >= 1
    assert len(spec["registration"]) >= 1
    # Poses must be valid SE(3)-ish: finite, bottom row [0,0,0,1].
    for pose in m["poses"][:2] + [spec["registration"][0]["pose"]]:
        P = np.asarray(pose, dtype=np.float64)
        assert P.shape == (4, 4)
        assert np.all(np.isfinite(P))
        np.testing.assert_allclose(P[3], [0.0, 0.0, 0.0, 1.0], atol=1e-9)
    # Relative paths only — the specs are dataset-root-relative by contract.
    assert not Path(m["point_clouds"][0]).is_absolute()
