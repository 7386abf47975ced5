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

def test_rgb_trained_orbax_checkpoint_channel_inference(tmp_path):
    """A run trained on RGB video with neither ensure_grayscale nor
    ensure_rgb set stores 3-channel stem kernels; the loader must infer 3
    from the checkpoint metadata, not default to 1 (regression: RGB-trained
    single_instance eval failed to restore with a (3,3,1,.) vs (3,3,3,.)
    shape mismatch)."""
    import jax
    import orbax.checkpoint as ocp

    import sleap_tpu.config as cfg
    from sleap_tpu.core.skeleton import Skeleton
    from sleap_tpu.inference.predictors import load_trained_model
    from sleap_tpu.models.model import Model

    skel = Skeleton("sk")
    skel.add_node("a")
    skel.add_node("b")
    job = cfg.TrainingJobConfig(
        model=cfg.ModelConfig(
            backbone=cfg.BackboneConfig(
                unet=cfg.UNetConfig(max_stride=8, output_stride=4, filters=4)
            ),
            heads=cfg.HeadsConfig(
                single_instance=cfg.SingleInstanceConfmapsHeadConfig(
                    part_names=["a", "b"], output_stride=4, sigma=1.5
                )
            ),
        )
    )
    job.data.labels.skeletons = [skel]
    assert not job.data.preprocessing.ensure_grayscale
    assert not job.data.preprocessing.ensure_rgb

    run = tmp_path / "run"
    run.mkdir()
    job.save_json(str(run / "training_config.json"))
    model = Model.from_config(job.model, skeleton=skel, update_config=True)
    _, variables = model.init(jax.random.PRNGKey(0), (32, 32, 3))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(str(run / "best_model.ckpt")), variables, force=True)
    ckptr.wait_until_finished()

    tm = load_trained_model(str(run))
    assert tm.input_channels == 3
    assert not tm.grayscale
