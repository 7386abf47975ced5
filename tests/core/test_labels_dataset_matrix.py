"""Port of the remaining reference ``tests/io/test_dataset.py`` matrix.

Covers the reference tests not yet mirrored elsewhere in this suite:
``test_complex_merge`` (:428), ``test_unify_skeletons``/``dont_unify``
(:709/:731), ``test_duplicate/distinct_skeletons_serializing`` (:680/:693),
``test_basic_suggestions``/``deserialize_suggestions`` (:784/:801),
``test_labels_append_hdf5`` (:1017), ``test_hdf5_from_predicted`` (:1038),
``test_hdf5_empty_save`` (:1059), ``test_makedirs`` (:1069),
``test_many_{tracks,videos,suggestions}_hdf5`` (:1098-1126), and the
``copy=False`` corner of ``test_split`` (:1496).
"""

import os

import numpy as np
import pytest

from sleap_tpu.core.instance import (
    Instance,
    LabeledFrame,
    Point,
    PredictedInstance,
    Track,
)
from sleap_tpu.core.labels import Labels, SuggestionFrame
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video
from sleap_tpu.info.suggestions import VideoFrameSuggestions

from tests.conftest import ref_data


def _one_node_skeleton():
    sk = Skeleton()
    sk.add_node("node")
    return sk


def _fly_skeleton():
    return Skeleton.load_json(
        ref_data("skeleton/fly_skeleton_legs.json")
    )


def test_complex_merge():
    """Reference test_dataset.py:428 — full conflict-aware 3-way merge."""
    video_a = Video.from_filename("foo.mp4")
    video_b = Video.from_filename("foo.mp4")
    skel_a = _one_node_skeleton()
    skel_b = _one_node_skeleton()

    labels_a = Labels()
    labels_a.append(
        LabeledFrame(
            video_a,
            frame_idx=0,
            instances=[
                Instance(skeleton=skel_a, points=dict(node=Point(1, 1))),
                Instance(skeleton=skel_a, points=dict(node=Point(2, 2))),
            ],
        )
    )

    def b_instances():
        return [
            Instance(skeleton=skel_b, points=dict(node=Point(1, 1))),
            Instance(skeleton=skel_b, points=dict(node=Point(3, 3))),
        ]

    labels_b = Labels()
    labels_b.append(LabeledFrame(video_b, frame_idx=0, instances=b_instances()))
    labels_b.append(LabeledFrame(video_b, frame_idx=1, instances=b_instances()))

    merged, extra_a, extra_b = Labels.complex_merge_between(labels_a, labels_b)

    # Cleanly merged: the frame_idx=1 frame with both instances.
    assert video_a in merged
    assert len(merged[video_a]) == 1
    assert len(merged[video_a][1]) == 2

    # labels_a now holds the redundant frame (conflicts removed) + clean one.
    assert len(labels_a.labeled_frames) == 2
    assert len(labels_a.labeled_frames[0].instances) == 1
    assert labels_a.labeled_frames[0].instances[0].points[0]["x"] == 1
    assert len(labels_a.labeled_frames[1].instances) == 2
    xs = sorted(i.points[0]["x"] for i in labels_a.labeled_frames[1].instances)
    assert xs == [1, 3]

    # One conflicting instance on each side.
    assert len(extra_a) == 1 and len(extra_b) == 1
    assert len(extra_a[0].instances) == 1 and len(extra_b[0].instances) == 1
    assert extra_a[0].instances[0].points[0]["x"] == 2
    assert extra_b[0].instances[0].points[0]["x"] == 3

    # Videos were unified across the conflict frames.
    assert extra_a[0].video is extra_b[0].video

    # Resolve using the new side.
    Labels.finish_complex_merge(labels_a, extra_b)
    assert len(labels_a.labeled_frames) == 2
    assert len(labels_a.labeled_frames[0].instances) == 2
    assert labels_a.labeled_frames[0].instances[1].points[0]["x"] == 3


def test_unify_skeletons():
    """Reference test_dataset.py:709 — extend_from(unify=True) swaps in the
    existing skeleton object."""
    vid = Video.from_filename("foo.mp4")
    skel_a = _fly_skeleton()
    skel_b = _fly_skeleton()
    lf_a = LabeledFrame(vid, frame_idx=2, instances=[Instance(skel_a)])
    lf_b = LabeledFrame(vid, frame_idx=3, instances=[Instance(skel_b)])

    labels = Labels()
    assert labels.extend_from([lf_a], unify=True)
    assert labels.extend_from([lf_b], unify=True)

    ids = {
        id(inst.skeleton)
        for lf in labels.labeled_frames
        for inst in lf.instances
    }
    assert len(ids) == 1
    assert len(labels.skeletons) == 1
    labels.to_dict()  # serializable


def test_dont_unify_skeletons():
    """Reference test_dataset.py:731 — unify=False keeps both objects."""
    vid = Video.from_filename("foo.mp4")
    lf_a = LabeledFrame(vid, frame_idx=2, instances=[Instance(_fly_skeleton())])
    lf_b = LabeledFrame(vid, frame_idx=3, instances=[Instance(_fly_skeleton())])

    labels = Labels(labeled_frames=[lf_a])
    labels.extend_from([lf_b], unify=False)
    ids = {
        id(inst.skeleton)
        for lf in labels.labeled_frames
        for inst in lf.instances
    }
    assert len(ids) == 2
    labels.to_dict()


def test_duplicate_skeletons_serializing():
    """Reference test_dataset.py:680."""
    vid = Video.from_filename("foo.mp4")
    lf_a = LabeledFrame(vid, frame_idx=2, instances=[Instance(_fly_skeleton())])
    lf_b = LabeledFrame(vid, frame_idx=3, instances=[Instance(_fly_skeleton())])
    d = Labels(labeled_frames=[lf_a, lf_b]).to_dict()
    assert len(d["skeletons"]) == 2


def test_distinct_skeletons_serializing():
    """Reference test_dataset.py:693."""
    vid = Video.from_filename("foo.mp4")
    skel_b = _fly_skeleton()
    skel_b.add_node("foo")
    lf_a = LabeledFrame(vid, frame_idx=2, instances=[Instance(_fly_skeleton())])
    lf_b = LabeledFrame(vid, frame_idx=3, instances=[Instance(skel_b)])
    d = Labels(labeled_frames=[lf_a, lf_b]).to_dict()
    assert len(d["skeletons"]) == 2
    assert any(n["name"] == "foo" for n in d["nodes"])


def test_to_dict_roundtrip_through_json_reader(tmp_path):
    """to_dict output is readable by the legacy-JSON importer."""
    import json

    labels = Labels.load_file(ref_data("slp_hdf5/minimal_instance.slp"))
    path = os.path.join(tmp_path, "roundtrip.json")
    with open(path, "w") as f:
        json.dump(labels.to_dict(), f)

    from sleap_tpu.io.formats import labels_json

    rt = labels_json.read_labels(path)
    assert len(rt) == len(labels)
    a, b = labels[0].numpy(), rt[0].numpy()
    assert np.allclose(a, b, equal_nan=True)


def test_basic_suggestions():
    """Reference test_dataset.py:784 (sample method)."""
    video = Video.from_media(ref_data("videos/small_robot.mp4"))
    labels = Labels()
    labels.append(
        LabeledFrame(video, frame_idx=0, instances=[Instance(_one_node_skeleton())])
    )
    suggestions = VideoFrameSuggestions.suggest(
        labels=labels,
        params=dict(videos=labels.videos, method="sample", per_video=13),
    )
    labels.set_suggestions(suggestions)
    assert len(labels.get_video_suggestions(video)) == 13


def test_stride_suggestions_dedupe():
    """Strided sampling skips indices already suggested."""
    video = Video.from_media(ref_data("videos/small_robot.mp4"))
    labels = Labels(videos=[video])
    labels.set_suggestions([SuggestionFrame(video, 0)])
    suggestions = VideoFrameSuggestions.suggest(
        labels=labels,
        params=dict(
            videos=[video], method="sample", per_video=5,
            sampling_method="stride",
        ),
    )
    assert len(suggestions) == 5
    assert all(s.frame_idx != 0 for s in suggestions)


def test_frame_chunk_suggestions():
    video = Video.from_media(ref_data("videos/small_robot.mp4"))
    labels = Labels(videos=[video])
    suggestions = VideoFrameSuggestions.suggest(
        labels=labels,
        params=dict(videos=[video], method="frame_chunk", frame_from=3, frame_to=7),
    )
    assert [s.frame_idx for s in suggestions] == [2, 3, 4, 5, 6]
    # Inverted range is empty; out-of-range from is skipped.
    assert (
        VideoFrameSuggestions.suggest(
            labels=labels,
            params=dict(videos=[video], method="frame_chunk", frame_from=7, frame_to=3),
        )
        == []
    )


def test_prediction_score_suggestions():
    labels = Labels.load_file(ref_data("tracks/clip.predictions.slp"))
    suggestions = VideoFrameSuggestions.suggest(
        labels=labels,
        params=dict(
            videos=labels.videos,
            method="prediction_score",
            score_limit=2.0,
            instance_limit_upper=2,
            instance_limit_lower=1,
        ),
    )
    assert len(suggestions) > 0
    assert all(isinstance(s, SuggestionFrame) for s in suggestions)


def test_velocity_and_displacement_suggestions():
    labels = Labels.load_file(ref_data("tracks/clip.predictions.slp"))
    by_velocity = VideoFrameSuggestions.suggest(
        labels=labels,
        params=dict(
            videos=labels.videos, method="velocity", node=0, threshold=0.8
        ),
    )
    assert len(by_velocity) > 0
    by_disp = VideoFrameSuggestions.suggest(
        labels=labels,
        params=dict(
            videos=labels.videos,
            method="max point displacement",  # space form dispatches too
            displacement_threshold=10.0,
        ),
    )
    assert all(s.frame_idx >= 1 for s in by_disp)


def test_unknown_suggestion_method_raises():
    with pytest.raises(ValueError):
        VideoFrameSuggestions.suggest(labels=Labels(), params=dict(method="nope"))


def test_deserialize_suggestions(tmp_path):
    """Reference test_dataset.py:801 — suggestions survive save/load."""
    video = Video.from_media(ref_data("videos/small_robot.mp4"))
    labels = Labels()
    labels.append(
        LabeledFrame(video, frame_idx=0, instances=[Instance(_one_node_skeleton())])
    )
    suggestions = VideoFrameSuggestions.suggest(
        labels=labels,
        params=dict(videos=labels.videos, method="sample", per_video=13),
    )
    labels.set_suggestions(suggestions)

    filename = os.path.join(tmp_path, "new_suggestions.slp")
    Labels.save_file(filename=filename, labels=labels)
    reloaded = Labels.load_file(filename)
    assert len(suggestions) == len(reloaded.suggestions)
    assert [s.frame_idx for s in suggestions] == [
        s.frame_idx for s in reloaded.suggestions
    ]


def test_labels_append_hdf5(tmp_path):
    """Reference test_dataset.py:1017 — frame-by-frame append roundtrip."""
    src = Labels.load_file(ref_data("tracks/clip.predictions.slp"))
    filename = os.path.join(tmp_path, "appended.slp")
    for lf in src.labeled_frames[:10]:
        Labels.save_hdf5(
            filename=filename, labels=Labels([lf]), append=True
        )
    loaded = Labels.load_hdf5(filename)
    assert len(loaded) == 10
    assert len(loaded.videos) == 1
    a = src[0].numpy()
    b = loaded[0].numpy()
    assert np.allclose(a, b, equal_nan=True, atol=1e-4)


def test_hdf5_from_predicted(tmp_path):
    """Reference test_dataset.py:1038 — from_predicted links roundtrip."""
    labels = Labels.load_file(ref_data("slp_hdf5/minimal_instance.slp"))
    frame = labels[0]
    pred = PredictedInstance.from_instance(frame.instances[0], 0.7)
    frame.instances[0].from_predicted = pred
    frame.instances.append(pred)

    filename = os.path.join(tmp_path, "linked.slp")
    labels.save(filename)
    loaded = Labels.load_file(filename)
    linked = loaded[0].instances[0].from_predicted
    assert linked is not None
    assert linked.score == pytest.approx(0.7)


def test_hdf5_empty_save(tmp_path):
    """Reference test_dataset.py:1059."""
    labels = Labels()
    filename = os.path.join(tmp_path, "empty.slp")
    Labels.save_hdf5(filename=filename, labels=labels)

    labels.videos.append(Video.from_filename("foo.mp4"))
    Labels.save_hdf5(filename=filename, labels=labels)
    assert len(Labels.load_file(filename, detect_videos=False).videos) == 1


def test_makedirs(tmp_path):
    """Reference test_dataset.py:1069 — parent dirs are created."""
    filename = os.path.join(tmp_path, "new", "dirs", "test.slp")
    Labels.save_file(filename=filename, labels=Labels())
    assert os.path.exists(filename)


def test_many_tracks_hdf5(tmp_path):
    labels = Labels()
    labels.tracks = [Track(spawned_on=i, name=f"track {i}") for i in range(4000)]
    filename = os.path.join(tmp_path, "tracks.slp")
    Labels.save_hdf5(filename=filename, labels=labels)
    assert len(Labels.load_file(filename).tracks) == 4000


def test_many_videos_hdf5(tmp_path):
    labels = Labels()
    labels.videos = [Video.from_filename(f"video {i}.mp4") for i in range(3000)]
    filename = os.path.join(tmp_path, "videos.slp")
    Labels.save_hdf5(filename=filename, labels=labels)
    assert len(Labels.load_file(filename, detect_videos=False).videos) == 3000


def test_many_suggestions_hdf5(tmp_path):
    labels = Labels()
    video = Video.from_filename("foo.mp4")
    labels.videos = [video]
    labels.suggestions = [SuggestionFrame(video, i) for i in range(3000)]
    filename = os.path.join(tmp_path, "suggestions.slp")
    Labels.save_hdf5(filename=filename, labels=labels)
    assert len(Labels.load_file(filename, detect_videos=False).suggestions) == 3000


def test_split_copy_false_shares_frames():
    """Reference test_dataset.py:1516-1520 — the copy=False single-frame
    corner: both splits hold the SAME LabeledFrame object."""
    labels = Labels.load_file(ref_data("slp_hdf5/minimal_instance.slp"))
    single = labels.extract([0], copy=True)
    a, b = single.split(0.8, copy=False)
    assert len(a) == 1 and len(b) == 1
    assert a[0] is b[0]
    a2, b2 = single.split(0.8)
    assert a2[0] is not b2[0]
    assert a2[0].frame_idx == b2[0].frame_idx
