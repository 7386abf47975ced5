"""Complex-merge corners and video-path fixing, ported from the reference's
tests/io/test_dataset.py:500-680 (merge_predictions, merge_with_package,
merge_with_skeleton_conflict) and :1127-1196 (path_fix, load_file,
local_path_save)."""

import os

import numpy as np
import pytest

from sleap_tpu.core.instance import (
    Instance,
    LabeledFrame,
    Point,
    PredictedInstance,
)
from sleap_tpu.core.labels import Labels, SuggestionFrame, load_file
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import HDF5Video, MediaVideo, Video

from tests.conftest import ref_data

VIDEOS_DIR = "/root/reference/tests/data/videos"


# --------------------------------------------------------------------------- #
# Merging (reference test_dataset.py:500)
# --------------------------------------------------------------------------- #


def test_merge_predictions():
    video_a = Video.from_filename("foo.mp4")
    video_b = Video.from_filename("foo.mp4")

    skel_a = Skeleton()
    skel_a.add_node("node")
    skel_b = Skeleton()
    skel_b.add_node("node")

    instances_a = [
        Instance(skeleton=skel_a, points=dict(node=Point(1, 1))),
        Instance(skeleton=skel_a, points=dict(node=Point(2, 2))),
    ]
    labels_a = Labels()
    labels_a.append(LabeledFrame(video_a, frame_idx=0, instances=instances_a))

    instances_b = [
        Instance(skeleton=skel_b, points=dict(node=Point(1, 1))),
        PredictedInstance(
            skeleton=skel_b, points=dict(node=Point(3, 3)), score=1
        ),
    ]
    labels_b = Labels()
    labels_b.append(LabeledFrame(video_b, frame_idx=0, instances=instances_b))

    # One redundant instance (perfect match); the non-matching instances are
    # different kinds (one predicted, one user) -> clean merge.
    merged, extra_a, extra_b = Labels.complex_merge_between(labels_a, labels_b)
    assert len(merged[video_a]) == 1
    assert len(merged[video_a][0]) == 1  # the predicted instance was merged
    assert not extra_a
    assert not extra_b


def test_merge_with_skeleton_conflict(min_labels, tmp_path):
    base_labels = min_labels.copy()
    base_labels.save(str(tmp_path / "base_labels.slp"))

    # --- renamed node ---
    labels = base_labels.copy()
    labels[0].frame_idx = 1
    labels.skeleton.relabel_node("A", "a")
    labels.save(str(tmp_path / "labels.renamed_node.slp"))

    labels = base_labels.copy()
    merged, extra_base, extra_new = Labels.complex_merge_between(
        labels, Labels.load_file(str(tmp_path / "labels.renamed_node.slp"))
    )
    assert len(extra_base) == 0
    assert len(extra_new) == 0
    assert labels.skeleton.node_names == ["A", "B", "a"]
    assert np.isnan(labels[0][0].numpy()).any(axis=1).tolist() == [
        False, False, True,
    ]
    assert np.isnan(labels[1][0].numpy()).any(axis=1).tolist() == [
        True, False, False,
    ]

    # --- new node ---
    labels = base_labels.copy()
    labels[0].frame_idx = 1
    labels.skeleton.add_node("C")
    labels[0][0]["C"] = Point(x=1, y=2, visible=True)
    labels.save(str(tmp_path / "labels.new_node.slp"))

    labels = base_labels.copy()
    merged, extra_base, extra_new = Labels.complex_merge_between(
        labels, Labels.load_file(str(tmp_path / "labels.new_node.slp"))
    )
    assert len(extra_base) == 0
    assert len(extra_new) == 0
    assert labels.skeleton.node_names == ["A", "B", "C"]
    assert np.isnan(labels[0][0].numpy()).any(axis=1).tolist() == [
        False, False, True,
    ]
    assert np.isnan(labels[1][0].numpy()).any(axis=1).tolist() == [
        False, False, False,
    ]

    # --- deleted node ---
    labels = base_labels.copy()
    labels[0].frame_idx = 1
    labels.skeleton.delete_node("A")
    labels.save(str(tmp_path / "labels.deleted_node.slp"))

    labels = base_labels.copy()
    merged, extra_base, extra_new = Labels.complex_merge_between(
        labels, Labels.load_file(str(tmp_path / "labels.deleted_node.slp"))
    )
    assert len(extra_base) == 0
    assert len(extra_new) == 0
    assert labels.skeleton.node_names == ["A", "B"]
    assert np.isnan(labels[0][0].numpy()).any(axis=1).tolist() == [False, False]
    assert np.isnan(labels[1][0].numpy()).any(axis=1).tolist() == [True, False]
    assert (labels[0][0].numpy()[1] == labels[1][0].numpy()[1]).all()


def test_merge_with_package(tmp_path):
    # Base: user labels on a real media video, plus one suggestion.
    labels = Labels.load_file(ref_data("slp_hdf5/small_robot_minimal.slp"))
    labels.suggestions.append(
        SuggestionFrame(video=labels.video, frame_idx=1)
    )
    pkg_path = str(tmp_path / "test.pkg.slp")
    assert len(labels.predicted_instances) == 0
    labels.save(pkg_path, with_images=True, embed_suggested=True)

    # Load package: embedded images with the media source recorded.
    labels_pkg = load_file(pkg_path)
    assert isinstance(labels_pkg.video.backend, HDF5Video)
    assert labels_pkg.video.backend.has_embedded_images
    src = labels_pkg.video.backend.source_video
    assert isinstance(src.backend, MediaVideo)
    assert len(labels_pkg.predicted_instances) == 0

    # Add a prediction on the suggested frame and save WITHOUT image data.
    inst = labels_pkg.user_instances[0]
    pts = inst.numpy()
    inst_pr = PredictedInstance.from_pointsarray(
        pts,
        skeleton=labels_pkg.skeleton,
        point_confidences=np.zeros(len(pts)),
        instance_score=1.0,
    )
    labels_pkg.append(
        LabeledFrame(
            video=labels_pkg.suggestions[0].video,
            frame_idx=labels_pkg.suggestions[0].frame_idx,
            instances=[inst_pr],
        )
    )
    preds_path = pkg_path + ".predictions.slp"
    labels_pkg.save(preds_path)

    labels_pr = load_file(preds_path)
    assert len(labels_pr.predicted_instances) == 1

    # Merge predictions into the ORIGINAL media-video labels: the prediction's
    # embedded-package video must unify with the media video via its source.
    base_video_path = labels.video.backend.filename
    merged, extra_base, extra_new = Labels.complex_merge_between(
        labels, labels_pr
    )
    assert len(labels.videos) == 1
    assert labels.video.backend.filename == base_video_path
    assert len(labels.predicted_instances) == 1
    assert len(extra_base) == 0
    assert len(extra_new) == 0
    assert labels.predicted_instances[0].frame.frame_idx == 1

    # Merge predictions into the PACKAGE labels instead.
    labels_pkg = load_file(pkg_path)
    labels_pr = load_file(preds_path)
    assert len(labels_pkg.predicted_instances) == 0
    base_video_path = labels_pkg.video.backend.filename
    merged, extra_base, extra_new = Labels.complex_merge_between(
        labels_pkg, labels_pr
    )
    assert len(labels_pkg.videos) == 1
    assert labels_pkg.video.backend.filename == base_video_path
    assert len(labels_pkg.predicted_instances) == 1
    assert len(extra_base) == 0
    assert len(extra_new) == 0
    assert labels_pkg.predicted_instances[0].frame.frame_idx == 1


# --------------------------------------------------------------------------- #
# Video-path fixing (reference test_dataset.py:1127)
# --------------------------------------------------------------------------- #


def test_path_fix(tmp_path):
    ref_data("videos/small_robot.mp4")
    labels = Labels()
    filename = str(tmp_path / "test.h5")

    # Add a video without a full path.
    labels.add_video(Video.from_filename("small_robot.mp4"))
    Labels.save_hdf5(filename=filename, labels=labels)

    # Pass the directory containing the video.
    labels = Labels.load_file(filename, video_search=[VIDEOS_DIR + "/"])
    assert len(labels.videos) == 1
    assert labels.videos[0].filename == os.path.join(
        VIDEOS_DIR, "small_robot.mp4"
    )


def test_path_fix_with_new_full_path(tmp_path):
    ref_data("videos/small_robot.mp4")
    labels = Labels()
    filename = str(tmp_path / "test.h5")

    # Bad filename entirely; pass full replacement paths positionally.
    labels.add_video(Video.from_filename("foo.mp4"))
    Labels.save_hdf5(filename=filename, labels=labels)

    labels = Labels.load_file(
        filename, video_search=[os.path.join(VIDEOS_DIR, "small_robot.mp4")]
    )
    assert len(labels.videos) == 1
    assert labels.videos[0].filename == os.path.join(
        VIDEOS_DIR, "small_robot.mp4"
    )


def test_load_file_search_paths(tmp_path):
    video_path = ref_data("videos/small_robot.mp4")
    labels = Labels()
    filename = str(tmp_path / "test.h5")
    labels.add_video(Video.from_filename("small_robot.mp4"))
    Labels.save_hdf5(filename=filename, labels=labels)

    # Fix video path from a full path.
    labels = load_file(filename, search_paths=video_path)
    assert os.path.samefile(labels.video.filename, video_path)

    # No auto-detect keeps the stored (relative) path.
    labels = load_file(filename, detect_videos=False)
    assert labels.video.filename == "small_robot.mp4"

    # Fix by searching next to the labels file.
    tmpvid = tmp_path / "small_robot.mp4"
    tmpvid.write_bytes(b"")  # dummy file
    assert os.path.samefile(load_file(filename).video.filename, str(tmpvid))
    assert os.path.samefile(
        load_file(filename, search_paths=str(tmp_path)).video.filename,
        str(tmpvid),
    )
    assert os.path.samefile(
        load_file(filename, search_paths=str(tmpvid)).video.filename,
        str(tmpvid),
    )


def test_local_path_save(tmp_path, monkeypatch):
    filename = "test.h5"
    monkeypatch.chdir(tmp_path)
    Labels().save(filename)
    assert os.path.exists(os.path.join(str(tmp_path), filename))
