"""Config system: JSON round-trips, oneof semantics, comments, profiles,
reference-config compatibility (reference sleap/nn/config/* + its tests)."""

import glob
import json
import os

import pytest

from sleap_tpu import config as cfg


def test_default_roundtrip():
    c = cfg.TrainingJobConfig()
    c2 = cfg.TrainingJobConfig.from_json(c.to_json())
    assert c2.to_json() == c.to_json()


def test_full_roundtrip_preserves_values(tmp_path):
    c = cfg.TrainingJobConfig()
    c.model.backbone.unet = cfg.UNetConfig(
        max_stride=32, filters=24, filters_rate=1.5, up_interpolate=True
    )
    c.model.heads.centroid = cfg.CentroidsHeadConfig(
        anchor_part="thorax", sigma=3.5, output_stride=2
    )
    c.data.preprocessing.input_scaling = 0.5
    c.optimization.epochs = 7
    c.optimization.augmentation_config.rotate = True
    c.outputs.run_name = "roundtrip"
    path = str(tmp_path / "config.json")
    with open(path, "w") as f:
        f.write(c.to_json())
    c2 = cfg.load_config(path)
    assert c2.model.backbone.unet.max_stride == 32
    assert c2.model.backbone.unet.filters == 24
    assert c2.model.heads.centroid.anchor_part == "thorax"
    assert c2.data.preprocessing.input_scaling == 0.5
    assert c2.optimization.epochs == 7
    assert c2.optimization.augmentation_config.rotate is True
    assert c2.outputs.run_name == "roundtrip"


def test_oneof_enforced():
    heads = cfg.HeadsConfig(
        centroid=cfg.CentroidsHeadConfig(),
        single_instance=cfg.SingleInstanceConfmapsHeadConfig(),
    )
    with pytest.raises(ValueError):
        _ = heads.which_oneof
    backbone = cfg.BackboneConfig(unet=cfg.UNetConfig(), leap=cfg.LEAPConfig())
    with pytest.raises(ValueError):
        _ = backbone.which_oneof


def test_oneof_selection():
    heads = cfg.HeadsConfig(centroid=cfg.CentroidsHeadConfig(sigma=9.0))
    assert heads.which_oneof_attrib_name == "centroid"
    assert heads.which_oneof.sigma == 9.0
    empty = cfg.HeadsConfig()
    assert empty.which_oneof is None


def test_json_with_comments(tmp_path):
    path = str(tmp_path / "commented.json")
    with open(path, "w") as f:
        f.write(
            """
{
  // training epochs
  "optimization": {"epochs": 3},
  /* block comment */
  "outputs": {"run_name": "commented"}
}
"""
        )
    c = cfg.load_config(path)
    assert c.optimization.epochs == 3
    assert c.outputs.run_name == "commented"


def test_unknown_fields_ignored(tmp_path):
    path = str(tmp_path / "future.json")
    with open(path, "w") as f:
        json.dump(
            {
                "optimization": {"epochs": 2, "field_from_the_future": 1},
                "brand_new_section": {"x": 1},
            },
            f,
        )
    c = cfg.load_config(path)
    assert c.optimization.epochs == 2


def test_shipped_profiles_load():
    import sleap_tpu

    profile_dir = os.path.join(
        os.path.dirname(sleap_tpu.__file__), "training_profiles"
    )
    profiles = sorted(glob.glob(os.path.join(profile_dir, "*.json")))
    assert len(profiles) >= 5
    for p in profiles:
        c = cfg.load_config(p)
        # Every profile selects exactly one backbone and at most one head.
        assert c.model.backbone.which_oneof is not None, p
        _ = c.model.heads.which_oneof  # must not raise


def test_reference_training_configs_load():
    ref_models = "/root/reference/tests/data/models"
    if not os.path.isdir(ref_models):
        pytest.skip("reference fixtures unavailable")
    paths = sorted(glob.glob(os.path.join(ref_models, "*", "training_config.json")))
    assert paths
    for p in paths:
        c = cfg.load_config(p)
        assert c.model.backbone.which_oneof is not None, p
        # Round-trips back to valid JSON.
        c2 = cfg.TrainingJobConfig.from_json(c.to_json())
        assert c2.model.backbone.which_oneof is not None
