"""VideoWriter backends: mp4 write -> decode roundtrip (reference
sleap/io/videowriter.py:18,26,47)."""

import os

import numpy as np
import pytest

from sleap_tpu.io.video import Video
from sleap_tpu.io.videowriter import VideoWriter, VideoWriterOpenCV


def _frames(n=8, h=32, w=48):
    rng = np.random.default_rng(0)
    # Large flat patches survive lossy encoding recognizably.
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        frames[i, :, : w // 2] = 50 + 20 * (i % 2)
        frames[i, :, w // 2 :] = 200 - 20 * (i % 2)
    return frames


def test_opencv_writer_roundtrip(tmp_path):
    path = str(tmp_path / "out.mp4")
    frames = _frames()
    writer = VideoWriterOpenCV(path, height=32, width=48, fps=30.0)
    for f in frames:
        writer.add_frame(f)
    writer.close()
    assert os.path.exists(path) and os.path.getsize(path) > 0

    video = Video.from_filename(path)
    assert video.num_frames == len(frames)
    decoded = video.get_frame(0)
    assert decoded.shape[:2] == (32, 48)
    # Lossy codec: halves should still be clearly dark vs bright.
    assert decoded[:, :20].mean() < 120 < decoded[:, 28:].mean()


def test_safe_builder_returns_working_writer(tmp_path):
    path = str(tmp_path / "safe.mp4")
    writer = VideoWriter.safe_builder(path, height=32, width=48, fps=25.0)
    for f in _frames(4):
        writer.add_frame(f)
    writer.close()
    video = Video.from_filename(path)
    assert video.num_frames == 4


def test_grayscale_frames_accepted(tmp_path):
    path = str(tmp_path / "gray.mp4")
    writer = VideoWriter.safe_builder(path, height=32, width=48)
    gray = _frames(4)[..., :1]  # (N, H, W, 1)
    for f in gray:
        writer.add_frame(f)
    writer.close()
    assert os.path.getsize(path) > 0
