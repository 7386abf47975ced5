"""Top-level package API parity with the reference's exports.

Reference: /root/reference/sleap/__init__.py:8-21 — everything a user can
reach as ``sleap.X`` must exist as ``sleap_tpu.X``.
"""

import os

import numpy as np
import pytest

import sleap_tpu

REF_VIDEO = "/root/reference/tests/data/videos/centered_pair_small.mp4"


def test_top_level_names():
    for name in [
        "__version__",
        "versions",
        "Labels",
        "load_file",
        "Video",
        "load_video",
        "LabeledFrame",
        "Instance",
        "PredictedInstance",
        "Track",
        "Skeleton",
        "load_model",
        "export_model",
        "use_cpu_only",
        "disable_preallocation",
        "system_summary",
        "TrainingJobConfig",
        "load_config",
        "load_metrics",
    ]:
        assert getattr(sleap_tpu, name, None) is not None, name


def test_versions_reports_core_libs():
    out = sleap_tpu.versions()
    assert "sleap-tpu" in out and "JAX" in out and "Python" in out


@pytest.mark.skipif(not os.path.exists(REF_VIDEO), reason="fixture absent")
def test_load_video_media():
    video = sleap_tpu.load_video(REF_VIDEO, grayscale=True)
    assert video.shape == (1100, 384, 384, 1)
    frame = video.get_frame(3)
    assert frame.shape == (384, 384, 1) and frame.dtype == np.uint8


def test_load_video_directory(tmp_path):
    import cv2

    for i in range(3):
        cv2.imwrite(
            str(tmp_path / f"img_{i}.png"),
            np.full((8, 6, 3), i * 10, np.uint8),
        )
    video = sleap_tpu.load_video(str(tmp_path))
    assert video.num_frames == 3
    assert video.get_frame(2).max() == 20
