"""Provider edge cases ported from /root/reference/tests/nn/data/test_providers.py.

Covers the reference's LabelsReader/VideoReader example contract: key set and
dtypes, user-instance filtering (in-place empty-instance removal), subset
index ordering, mp4 decode shape/grayscale, and multi-size detection.
"""

import numpy as np
import pytest

from sleap_tpu.core.labels import Labels
from sleap_tpu.data.providers import LabelsReader, VideoReader
from sleap_tpu.io.video import Video

ROBOT_MP4 = "/root/reference/tests/data/videos/small_robot.mp4"


def test_labels_reader(min_labels):
    reader = LabelsReader.from_user_instances(min_labels)
    assert not reader.is_from_multi_size_videos
    assert len(reader) == 1

    example = next(iter(reader))
    assert example["image"].shape == (384, 384, 1)
    assert example["image"].dtype == np.uint8
    np.testing.assert_array_equal(example["raw_image_size"], (384, 384, 1))
    assert example["raw_image_size"].dtype == np.int32
    assert example["example_ind"] == 0
    assert example["video_ind"] == 0
    assert example["frame_ind"] == 0
    assert example["instances"].shape == (2, 2, 2)
    assert example["instances"].dtype == np.float32
    np.testing.assert_array_equal(example["scale"], (1.0, 1.0))
    assert example["scale"].dtype == np.float32
    np.testing.assert_array_equal(example["skeleton_inds"], [0, 0])


def test_labels_reader_no_visible_points(min_labels):
    labels = min_labels.copy()
    assert len(labels.labeled_frames[0].instances) == 2

    # Non-visible instances are removed in place by from_user_instances.
    inst = labels.labeled_frames[0].instances[0]
    inst.points["visible"] = False
    reader = LabelsReader.from_user_instances(labels)
    assert len(labels.labeled_frames[0].instances) == 1
    example = next(iter(reader))
    assert len(example["instances"]) == 1

    # All instances invisible -> the frame (and reader) are empty.
    labels = min_labels.copy()
    for inst in labels.labeled_frames[0].instances:
        inst.points["visible"] = False
    reader = LabelsReader.from_user_instances(labels)
    assert len(labels) == 0
    assert len(reader) == 0


def test_labels_reader_subset(min_labels):
    lf = min_labels[0]
    labels = Labels(
        [
            type(lf)(video=lf.video, frame_idx=i, instances=list(lf.instances))
            for i in range(3)
        ]
    )
    assert len(labels) == 3
    reader = LabelsReader(labels, example_indices=[2, 1])
    assert len(reader) == 2
    examples = list(iter(reader))
    assert len(examples) == 2
    assert examples[0]["example_ind"] == 2
    assert examples[1]["example_ind"] == 1


def test_video_reader_mp4():
    reader = VideoReader.from_filepath(ROBOT_MP4)
    assert len(reader) == 166
    example = next(iter(reader))
    assert example["image"].shape[:2] == (320, 560)
    assert example["image"].dtype == np.uint8
    assert example["frame_ind"] == 0
    np.testing.assert_array_equal(example["scale"], (1.0, 1.0))


def test_video_reader_mp4_subset():
    reader = VideoReader.from_filepath(ROBOT_MP4, example_indices=[2, 1, 4])
    assert len(reader) == 3
    examples = list(iter(reader))
    assert [e["frame_ind"] for e in examples] == [2, 1, 4]


def test_video_reader_mp4_grayscale():
    reader = VideoReader.from_filepath(ROBOT_MP4, grayscale=True)
    example = next(iter(reader))
    assert example["image"].shape == (320, 560, 1)
    np.testing.assert_array_equal(example["raw_image_size"], (320, 560, 1))


def test_labels_reader_multi_size():
    skel_labels = Labels.load_file(
        "/root/reference/tests/data/slp_hdf5/minimal_instance.slp"
    )
    v2 = Video.from_numpy(np.zeros((2, 100, 100, 1), np.uint8))
    skel_labels.add_video(v2)
    reader = LabelsReader(skel_labels)
    assert reader.is_from_multi_size_videos
    assert reader.max_height_and_width == (384, 384)
