"""Pipeline-builder tests: the six reference builders genuinely produce
batches with on-chip-computed ground truth (reference
tests/nn/data/test_pipelines.py strategy)."""

import numpy as np
import pytest

from sleap_tpu import config as cfg
from sleap_tpu.core.instance import Instance, LabeledFrame, Track
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.data.pipelines import (
    BottomUpMultiClassPipeline,
    BottomUpPipeline,
    CentroidConfmapsPipeline,
    SingleInstanceConfmapsPipeline,
    TopdownConfmapsPipeline,
    TopDownMultiClassPipeline,
)
from sleap_tpu.data.providers import LabelsReader
from sleap_tpu.io.video import Video


@pytest.fixture
def labels():
    rng = np.random.default_rng(0)
    skel = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)], name="S")
    video = Video.from_numpy(rng.integers(0, 255, (5, 32, 32, 1), np.uint8))
    ta, tb = Track(0, "A"), Track(0, "B")
    lfs = [
        LabeledFrame(
            video=video, frame_idx=i,
            instances=[
                Instance(skeleton=skel, points=rng.uniform(4, 14, (2, 2)), track=ta),
                Instance(skeleton=skel, points=rng.uniform(18, 28, (2, 2)), track=tb),
            ],
        )
        for i in range(5)
    ]
    return Labels(lfs)


def _opt(batch_size=2):
    o = cfg.OptimizationConfig()
    o.batch_size = batch_size
    return o


def _data(pad=2, crop=None):
    d = cfg.DataConfig(preprocessing=cfg.PreprocessingConfig(pad_to_stride=pad))
    if crop:
        d.instance_cropping = cfg.InstanceCroppingConfig(crop_size=crop)
    return d


def test_single_instance_training_pipeline(labels):
    p = SingleInstanceConfmapsPipeline(
        data_config=_data(),
        optimization_config=_opt(),
        single_instance_confmap_head=cfg.SingleInstanceConfmapsHeadConfig(
            output_stride=2, sigma=3.0
        ),
    ).make_training_pipeline(LabelsReader(labels=labels))
    batches = list(p)
    assert sum(n for _, n in batches) == 5
    ex, n = batches[0]
    assert ex["image"].shape == (2, 32, 32, 1)
    assert ex["SingleInstanceConfmapsHead"].shape == (2, 16, 16, 2)
    assert ex["SingleInstanceConfmapsHead"].max() > 0.5


def test_centroid_training_pipeline(labels):
    p = CentroidConfmapsPipeline(
        data_config=_data(),
        optimization_config=_opt(),
        centroid_confmap_head=cfg.CentroidsHeadConfig(output_stride=2, sigma=3.0),
    ).make_training_pipeline(labels)
    ex, _ = next(iter(p))
    assert ex["CentroidConfmapsHead"].shape == (2, 16, 16, 1)


def test_topdown_training_pipeline(labels):
    p = TopdownConfmapsPipeline(
        data_config=_data(crop=16),
        optimization_config=_opt(),
        instance_confmap_head=cfg.CenteredInstanceConfmapsHeadConfig(
            output_stride=2, sigma=3.0
        ),
    ).make_training_pipeline(labels)
    ex, _ = next(iter(p))
    # Crop-sized images, one instance per example.
    assert ex["image"].shape == (2, 16, 16, 1)
    assert ex["CenteredInstanceConfmapsHead"].shape == (2, 8, 8, 2)


def test_bottomup_training_pipeline(labels):
    p = BottomUpPipeline(
        data_config=_data(),
        optimization_config=_opt(),
        confmaps_head=cfg.MultiInstanceConfmapsHeadConfig(output_stride=2, sigma=3.0),
        pafs_head=cfg.PartAffinityFieldsHeadConfig(output_stride=2, sigma=3.0),
    ).make_training_pipeline(labels)
    ex, _ = next(iter(p))
    assert ex["MultiInstanceConfmapsHead"].shape == (2, 16, 16, 2)
    assert ex["PartAffinityFieldsHead"].shape[-1] == 2  # 1 edge * 2


def test_multiclass_training_pipelines(labels):
    p = BottomUpMultiClassPipeline(
        data_config=_data(),
        optimization_config=_opt(),
        confmaps_head=cfg.MultiInstanceConfmapsHeadConfig(output_stride=2, sigma=3.0),
        class_maps_head=cfg.ClassMapsHeadConfig(output_stride=2, sigma=3.0),
    ).make_training_pipeline(labels)
    ex, _ = next(iter(p))
    assert ex["ClassMapsHead"].shape == (2, 16, 16, 2)  # 2 classes

    p2 = TopDownMultiClassPipeline(
        data_config=_data(crop=16),
        optimization_config=_opt(),
        instance_confmap_head=cfg.CenteredInstanceConfmapsHeadConfig(
            output_stride=2, sigma=3.0
        ),
        class_vectors_head=cfg.ClassVectorsHeadConfig(num_fc_layers=1),
    ).make_training_pipeline(labels)
    ex2, _ = next(iter(p2))
    assert ex2["ClassVectorsHead"].shape == (2, 2)


def test_base_and_viz_pipelines(labels):
    builder = SingleInstanceConfmapsPipeline(
        data_config=_data(), optimization_config=_opt()
    )
    base = builder.make_base_pipeline(LabelsReader(labels=labels))
    batch, n = next(iter(base))
    assert "image" in batch and n == 2
    viz = builder.make_viz_pipeline(LabelsReader(labels=labels))
    batch, n = next(iter(viz))
    assert n == 1
