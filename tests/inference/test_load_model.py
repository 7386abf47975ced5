"""The ``sleap_tpu.load_model`` user API across fixture model types.

Port of /root/reference/tests/nn/test_inference.py:928 (zipped model
bundles) and :948 (predictor dispatch per fixture model folder).
"""

import os
import shutil

import numpy as np
import pytest

MODELS = "/root/reference/tests/data/models"


def _require(name):
    p = os.path.join(MODELS, name)
    if not os.path.exists(p):
        pytest.skip(f"reference fixture unavailable: {p}")
    return p


@pytest.mark.slow
@pytest.mark.parametrize(
    "fixtures, expected",
    [
        (["minimal_robot.UNet.single_instance"], "SingleInstancePredictor"),
        (["minimal_instance.UNet.centroid",
          "minimal_instance.UNet.centered_instance"], "TopDownPredictor"),
        (["minimal_instance.UNet.bottomup"], "BottomUpPredictor"),
        (["min_tracks_2node.UNet.bottomup_multiclass"],
         "BottomUpMultiClassPredictor"),
    ],
)
def test_load_model_dispatch(fixtures, expected):
    import sleap_tpu

    paths = [_require(f) for f in fixtures]
    predictor = sleap_tpu.load_model(paths, batch_size=2, peak_threshold=0.3)
    assert type(predictor).__name__ == expected
    # kwargs actually land on the predictor.
    assert predictor.batch_size == 2
    assert float(predictor.peak_threshold) == 0.3


@pytest.mark.slow
@pytest.mark.parametrize("zip_func", [shutil.make_archive])
def test_load_model_zipped(tmp_path, zip_func):
    # Reference :928 — a zipped run folder loads transparently.
    import sleap_tpu

    src = _require("minimal_instance.UNet.bottomup")
    staged = tmp_path / "model"
    shutil.copytree(src, staged)
    zip_path = zip_func(str(tmp_path / "bundle"), "zip", str(staged))
    predictor = sleap_tpu.load_model(zip_path)
    assert type(predictor).__name__ == "BottomUpPredictor"

    # And it actually predicts.
    labels = sleap_tpu.load_file(os.path.join(src, "labels_gt.val.slp"))
    out = predictor.predict(labels)
    assert len(out) >= 1


@pytest.mark.slow
def test_load_model_single_path_string():
    import sleap_tpu

    src = _require("minimal_robot.UNet.single_instance")
    predictor = sleap_tpu.load_model(src)
    assert type(predictor).__name__ == "SingleInstancePredictor"