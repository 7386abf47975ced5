"""Zero-detection robustness: every predictor type must survive frames where
nothing clears the peak threshold (reference behavior: labeled frames with no
instances; `sleap-track --no-empty-frames` then drops them downstream)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_tpu.config import (
    BackboneConfig,
    CenteredInstanceConfmapsHeadConfig,
    CentroidsHeadConfig,
    HeadsConfig,
    ModelConfig,
    MultiInstanceConfig,
    MultiInstanceConfmapsHeadConfig,
    PartAffinityFieldsHeadConfig,
    SingleInstanceConfmapsHeadConfig,
    TrainingJobConfig,
    UNetConfig,
)
from sleap_tpu.inference.bottomup import BottomUpPredictor
from sleap_tpu.inference.predictors import (
    SingleInstancePredictor,
    TopDownPredictor,
    TrainedModel,
)
from sleap_tpu.models.model import Model


def _make(model_cfg, hw, crop=64):
    cfg = TrainingJobConfig(model=model_cfg)
    cfg.data.instance_cropping.crop_size = crop
    model = Model.from_config(model_cfg)
    module = model.make_flax_module()
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 1)), train=False
    )
    return TrainedModel(
        config=cfg, model=model, module=module, variables=variables,
        input_channels=1,
    )


def _unet(**heads):
    return ModelConfig(
        backbone=BackboneConfig(
            unet=UNetConfig(max_stride=8, output_stride=4, filters=4)
        ),
        heads=HeadsConfig(**heads),
    )


FRAMES = np.zeros((2, 128, 128, 1), np.uint8)  # black: nothing above threshold


def _assert_empty(labels):
    assert len(labels) == 2
    assert all(len(lf.instances) == 0 for lf in labels)


def test_single_instance_empty_frames():
    cfg = _unet(
        single_instance=SingleInstanceConfmapsHeadConfig(
            part_names=["a", "b"], output_stride=4
        )
    )
    pred = SingleInstancePredictor(
        confmap_model=_make(cfg, 128), batch_size=2, peak_threshold=100.0
    )
    _assert_empty(pred.predict(FRAMES, make_labels=True))


def test_bottomup_empty_frames():
    cfg = _unet(
        multi_instance=MultiInstanceConfig(
            confmaps=MultiInstanceConfmapsHeadConfig(
                part_names=["a", "b"], output_stride=4
            ),
            pafs=PartAffinityFieldsHeadConfig(edges=[["a", "b"]], output_stride=8),
        )
    )
    pred = BottomUpPredictor(
        bottomup_model=_make(cfg, 128), batch_size=2, peak_threshold=100.0,
        max_instances=3,
    )
    _assert_empty(pred.predict(FRAMES, make_labels=True))


def test_topdown_empty_frames():
    cen = _unet(centroid=CentroidsHeadConfig(output_stride=4))
    ci = _unet(
        centered_instance=CenteredInstanceConfmapsHeadConfig(
            part_names=["a", "b"], output_stride=4
        )
    )
    pred = TopDownPredictor(
        centroid_model=_make(cen, 128), confmap_model=_make(ci, 64),
        batch_size=2, peak_threshold=100.0,
    )
    _assert_empty(pred.predict(FRAMES, make_labels=True))


def test_multiclass_bottomup_empty_frames():
    from sleap_tpu.config import ClassMapsHeadConfig, MultiClassBottomUpConfig
    from sleap_tpu.inference.multiclass import BottomUpMultiClassPredictor

    cfg = _unet(
        multi_class_bottomup=MultiClassBottomUpConfig(
            confmaps=MultiInstanceConfmapsHeadConfig(
                part_names=["a", "b"], output_stride=4
            ),
            class_maps=ClassMapsHeadConfig(classes=["x", "y"], output_stride=4),
        )
    )
    pred = BottomUpMultiClassPredictor(
        model=_make(cfg, 128), batch_size=2, peak_threshold=100.0
    )
    _assert_empty(pred.predict(FRAMES, make_labels=True))


def test_multiclass_topdown_empty_frames():
    from sleap_tpu.config import ClassVectorsHeadConfig, MultiClassTopDownConfig
    from sleap_tpu.inference.multiclass import TopDownMultiClassPredictor

    td = _unet(
        multi_class_topdown=MultiClassTopDownConfig(
            confmaps=CenteredInstanceConfmapsHeadConfig(
                part_names=["a", "b"], output_stride=4
            ),
            class_vectors=ClassVectorsHeadConfig(
                classes=["x", "y"], num_fc_layers=1, num_fc_units=8,
                output_stride=8,
            ),
        )
    )
    cen = _unet(centroid=CentroidsHeadConfig(output_stride=4))
    pred = TopDownMultiClassPredictor(
        centroid_model=_make(cen, 128), confmap_model=_make(td, 64),
        batch_size=2, peak_threshold=100.0,
    )
    _assert_empty(pred.predict(FRAMES, make_labels=True))
