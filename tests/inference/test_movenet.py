"""MoveNet adapter tests with an injected fake model.

The download is the only gated part (reference inference.py:4608 pulls from
TF Hub); all wrapper logic — resize/pad preprocessing, [y,x,score] decode,
coordinate un-scaling, thresholding, frame assembly — is exercised here.
"""

import numpy as np
import pytest

from sleap_tpu.data.providers import VideoReader
from sleap_tpu.inference.movenet import (
    COCO_17_NODES,
    MoveNetPredictor,
    movenet_skeleton,
)
from sleap_tpu.io.video import Video


def fake_movenet(norm_points, scores):
    """Model returning fixed normalized [y, x, score] rows."""

    def model_fn(images):
        assert images.shape[1:] == (192, 192, 3)
        assert images.dtype == np.int32
        raw = np.concatenate([norm_points[:, ::-1], scores[:, None]], axis=1)
        return raw.reshape(1, 1, 17, 3).astype(np.float32)

    return model_fn


def test_movenet_skeleton():
    skel = movenet_skeleton()
    assert skel.node_names == COCO_17_NODES
    assert len(skel.edges) == 18


def test_movenet_requires_local_model():
    with pytest.raises(NotImplementedError, match="offline"):
        MoveNetPredictor.from_trained_models("lightning")


def test_movenet_predict_coordinates_roundtrip():
    # 96x192 frames: resize-and-pad scale = 1.0 in x after fit (scale = 1.0
    # when width is the binding dim: min(192/96, 192/192) = 1.0).
    frames = np.zeros((3, 96, 192, 1), np.uint8)
    video = Video.from_numpy(frames)
    # Normalized (x, y) positions inside the padded 192x192 canvas.
    xy = np.tile(np.array([[0.25, 0.25]]), (17, 1))
    scores = np.full(17, 0.9)
    scores[5] = 0.05  # below threshold -> NaN
    pred = MoveNetPredictor.from_trained_models(
        "lightning", model_path=fake_movenet(xy, scores), peak_threshold=0.2
    )
    labels = pred.predict(VideoReader(video=video))
    assert len(labels) == 3
    inst = labels[0].instances[0]
    pts = inst.numpy()
    # scale = min(192/96, 192/192) = 1.0 -> points = 0.25 * 192 = 48.
    np.testing.assert_allclose(pts[0], [48.0, 48.0], atol=1e-5)
    assert np.isnan(pts[5]).all()
    assert inst.skeleton.node_names == COCO_17_NODES


def test_movenet_predict_scaled_video():
    # 384x384 video -> scale 0.5; normalized 0.5 -> 96 px padded -> 192 px orig.
    frames = np.zeros((2, 384, 384, 3), np.uint8)
    video = Video.from_numpy(frames)
    xy = np.tile(np.array([[0.5, 0.5]]), (17, 1))
    pred = MoveNetPredictor.from_trained_models(
        "lightning", model_path=fake_movenet(xy, np.full(17, 1.0))
    )
    labels = pred.predict(VideoReader(video=video))
    pts = labels[0].instances[0].numpy()
    np.testing.assert_allclose(pts, np.tile([[192.0, 192.0]], (17, 1)), atol=0.5)


def test_movenet_via_load_model():
    from sleap_tpu.inference.predictors import load_model

    with pytest.raises(NotImplementedError, match="offline"):
        load_model("movenet-thunder")
