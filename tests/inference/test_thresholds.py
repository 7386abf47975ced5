"""Peak-threshold and max-instances predictor behavior.

Ports the reference's high-threshold matrix (tests/nn/test_inference.py:
613-680, 757-853): a peak_threshold above any achievable confidence yields
zero instances for every predictor family, and the centroid stage's
max_instances caps (but never pads) detections.
"""

import os

import numpy as np
import pytest

import sleap_tpu
from sleap_tpu.core.labels import Labels

MODELS = "/root/reference/tests/data/models"
DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MODELS), reason="reference fixtures absent"
)


def _predict(model_paths, labels_path, n_frames=None, **kwargs):
    predictor = sleap_tpu.load_model(model_paths, **kwargs)
    labels = Labels.load_file(labels_path)
    if n_frames is not None:
        # The reference's multiclass high-threshold tests predict frame 0
        # only (tests/nn/test_inference.py:843, `min_tracks_2node_labels[[0]]`)
        # — the trained fixture legitimately emits confidences > 1.5 on ~10%
        # of the full clip's frames.
        labels = Labels(labels.labeled_frames[:n_frames])
    return predictor.predict(labels)


def test_single_instance_high_peak_thresh():
    model = os.path.join(MODELS, "minimal_robot.UNet.single_instance")
    data = os.path.join(DATA, "slp_hdf5", "small_robot_minimal.slp")
    if not os.path.exists(data):
        pytest.skip("fixture unavailable")

    labels_pr = _predict(model, data, peak_threshold=0.0)
    assert len(labels_pr) == 2
    assert all(len(lf) == 1 for lf in labels_pr)
    assert labels_pr[0][0].n_visible_points == 2

    labels_pr = _predict(model, data, peak_threshold=1.5)
    assert len(labels_pr) == 2
    assert all(len(lf) == 0 for lf in labels_pr)


def test_topdown_centroid_high_threshold():
    model = os.path.join(MODELS, "minimal_instance.UNet.centroid")
    data = os.path.join(DATA, "slp_hdf5", "minimal_instance.slp")
    labels_pr = _predict(model, data, peak_threshold=1.5)
    assert len(labels_pr) == 1
    assert len(labels_pr[0].instances) == 0


def test_topdown_centered_instance_high_threshold():
    model = os.path.join(MODELS, "minimal_instance.UNet.centered_instance")
    data = os.path.join(DATA, "slp_hdf5", "minimal_instance.slp")
    labels_pr = _predict(model, data, peak_threshold=1.5)
    assert len(labels_pr) == 1
    assert len(labels_pr[0].instances) == 0


def test_bottomup_high_peak_thresh():
    model = os.path.join(MODELS, "minimal_instance.UNet.bottomup")
    data = os.path.join(DATA, "slp_hdf5", "minimal_instance.slp")
    labels_pr = _predict(model, data, peak_threshold=1.5)
    assert len(labels_pr) == 1
    assert len(labels_pr[0].instances) == 0


def test_bottomup_multiclass_high_threshold():
    model = os.path.join(MODELS, "min_tracks_2node.UNet.bottomup_multiclass")
    data = os.path.join(DATA, "tracks", "clip.2node.slp")
    if not os.path.exists(data):
        pytest.skip("fixture unavailable")
    labels_pr = _predict(model, data, n_frames=1, peak_threshold=1.5)
    assert len(labels_pr) == 1
    assert all(len(lf.instances) == 0 for lf in labels_pr)


def test_topdown_multiclass_high_threshold():
    model = os.path.join(MODELS, "min_tracks_2node.UNet.topdown_multiclass")
    data = os.path.join(DATA, "tracks", "clip.2node.slp")
    if not os.path.exists(data):
        pytest.skip("fixture unavailable")
    labels_pr = _predict(model, data, n_frames=1, peak_threshold=1.5)
    assert len(labels_pr) == 1
    assert all(len(lf.instances) == 0 for lf in labels_pr)


def test_topdown_centroid_max_instances():
    centroid = os.path.join(MODELS, "minimal_instance.UNet.centroid")
    instance = os.path.join(MODELS, "minimal_instance.UNet.centered_instance")
    data = os.path.join(DATA, "slp_hdf5", "minimal_instance.slp")
    # max_instances <, =, > the 2 expected animals: capped, never padded.
    for i in (1, 2, 3):
        labels_pr = _predict([centroid, instance], data, max_instances=i)
        assert len(labels_pr) == 1
        assert len(labels_pr[0].instances) == min(i, 2)
