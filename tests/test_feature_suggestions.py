"""Feature-suggestion pipeline tests (reference tests/info/test_feature_suggestions.py)."""

import os

import numpy as np
import pytest

from sleap_tpu.info.feature_suggestions import (
    FeatureSuggestionPipeline,
    ParallelFeaturePipeline,
)
from sleap_tpu.io.video import Video

MP4 = "/root/reference/tests/data/videos/centered_pair_small.mp4"


@pytest.mark.parametrize("feature_type", ["raw", "hog", "brisk"])
def test_pipeline_feature_types(feature_type):
    video = Video.from_numpy(
        np.random.default_rng(0).integers(0, 255, (12, 32, 32, 1), np.uint8)
    )
    pipeline = FeatureSuggestionPipeline(
        per_video=8, n_clusters=3, per_cluster=2, feature_type=feature_type
    )
    suggestions = pipeline.get_suggestion_frames([video])
    assert 1 <= len(suggestions) <= 6
    assert all(0 <= s.group < 3 for s in suggestions)


def test_parallel_pipeline_on_disk_videos():
    if not os.path.exists(MP4):
        pytest.skip("reference fixture unavailable")
    videos = [Video.from_filename(MP4), Video.from_filename(MP4)]
    pipeline = FeatureSuggestionPipeline(per_video=6, n_clusters=2, per_cluster=2)
    suggestions = ParallelFeaturePipeline.run(pipeline, videos)
    assert len(suggestions) >= 2
    # Group offsets separate the two videos' clusters.
    groups0 = {s.group for s in suggestions if s.video is videos[0]}
    groups1 = {s.group for s in suggestions if s.video is videos[1]}
    assert groups0 and groups1 and not (groups0 & groups1)
    # SuggestionFrames reference the parent's video objects.
    assert all(s.video in videos for s in suggestions)


def test_parallel_pipeline_numpy_fallback():
    """Numpy-backed videos can't cross a process boundary; they run serially."""
    videos = [
        Video.from_numpy(
            np.random.default_rng(i).integers(0, 255, (10, 24, 24, 1), np.uint8)
        )
        for i in range(2)
    ]
    pipeline = FeatureSuggestionPipeline(per_video=6, n_clusters=2, per_cluster=2)
    suggestions = ParallelFeaturePipeline.run(pipeline, videos)
    assert len(suggestions) >= 2
