"""Async host->device staging (BASELINE config 4 streaming path)."""

import numpy as np
import pytest

from sleap_tpu.data.streaming import stage_to_device


def _batches(n, batch=2, hw=8):
    for i in range(n):
        img = np.full((batch, hw, hw, 1), i, np.uint8)
        yield {"image": img, "frame_ind": np.arange(batch) + i * batch}, batch


def test_stage_to_device_order_and_content():
    seen = []
    for batch, n_valid, dev in stage_to_device(_batches(7), depth=2):
        assert n_valid == 2
        arr = np.asarray(dev)
        np.testing.assert_array_equal(arr, batch["image"])
        seen.append(int(arr[0, 0, 0, 0]))
    assert seen == list(range(7))


def test_stage_to_device_keeps_transfers_in_flight():
    """The stager dispatches `depth` transfers ahead of the consumer."""
    produced = []

    def producer():
        for item in _batches(5):
            produced.append(len(produced))
            yield item

    gen = stage_to_device(producer(), depth=2)
    first = next(gen)
    # Consuming ONE item required producing depth+1 = 3 (two in flight).
    assert len(produced) == 3
    assert int(np.asarray(first[2])[0, 0, 0, 0]) == 0
    rest = list(gen)
    assert len(rest) == 4


def test_streaming_predict_on_real_mp4():
    """End-to-end: a real fixture mp4 streams through predict() via the
    staged path (decode thread -> async device_put -> jitted normalize+model;
    reference inference.py:329,377-417)."""
    import os

    video_path = "/root/reference/tests/data/videos/centered_pair_small.mp4"
    if not os.path.exists(video_path):
        pytest.skip("reference fixtures not available")

    from sleap_tpu.data.providers import VideoReader
    from sleap_tpu.inference.predictors import SingleInstancePredictor
    from sleap_tpu.io.video import Video

    model_dir = "/root/reference/tests/data/models/minimal_robot.UNet.single_instance"
    if not os.path.exists(model_dir):
        pytest.skip("reference model fixture unavailable")
    predictor = SingleInstancePredictor.from_trained_models(model_dir, batch_size=4)
    video = Video.from_filename(video_path)
    provider = VideoReader(video=video, example_indices=list(range(10)))
    labels = predictor.predict(provider)
    assert len(labels) == 10
    # Frames flow in order and each got a (possibly low-confidence) pose.
    assert [lf.frame_idx for lf in labels] == list(range(10))
