"""Labels dataset-object behaviors (reference tests/test_dataset.py).

Covers the MutableSequence surface, find/frames queries, registry and cache
maintenance, instance views, frame removal/merging, extract/split, the
tracked-occupancy numpy export, and track occupancy ranges
(reference sleap/io/dataset.py:389).
"""

import numpy as np
import pytest

from sleap_tpu.core.instance import (
    Instance,
    LabeledFrame,
    PredictedInstance,
    Track,
)
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video


@pytest.fixture
def skeleton():
    sk = Skeleton("s")
    sk.add_nodes(["a", "b"])
    sk.add_edge("a", "b")
    return sk


@pytest.fixture
def video():
    return Video.from_numpy(np.zeros((8, 16, 16, 1), np.uint8))


def make_labels(skeleton, video, n_frames=4):
    tracks = [Track(name="t0"), Track(name="t1")]
    lfs = []
    for fi in range(n_frames):
        insts = [
            Instance(
                skeleton=skeleton,
                points=np.array([[fi, 0.0], [fi, 1.0]]),
                track=tracks[0],
            ),
            PredictedInstance.from_arrays(
                np.array([[10.0 + fi, 0.0], [10.0 + fi, 1.0]]),
                np.array([0.5, 0.6]),
                0.9,
                skeleton,
                track=tracks[1],
            ),
        ]
        lfs.append(LabeledFrame(video=video, frame_idx=fi, instances=insts))
    return Labels(labeled_frames=lfs)


def test_registries_collected_from_frames(skeleton, video):
    labels = make_labels(skeleton, video)
    assert labels.videos == [video]
    assert labels.skeletons == [skeleton]
    assert len(labels.tracks) == 2
    assert labels.skeleton is skeleton
    assert labels.video is video


def test_sequence_interface(skeleton, video):
    labels = make_labels(skeleton, video)
    assert len(labels) == 4
    lf = labels[0]
    assert lf in labels
    assert video in labels
    assert skeleton in labels
    assert (video, 2) in labels
    assert (video, 99) not in labels

    del labels[0]
    assert len(labels) == 3
    assert lf not in labels
    # Cache reflects deletion.
    assert labels.find(video, 0) == []

    labels.insert(0, lf)
    assert labels.find(video, 0) == [lf]


def test_append_registers_new_objects(skeleton):
    labels = Labels()
    v2 = Video.from_numpy(np.zeros((2, 8, 8, 1), np.uint8))
    t = Track(name="new")
    lf = LabeledFrame(
        video=v2, frame_idx=0, instances=[Instance(skeleton=skeleton, track=t)]
    )
    labels.append(lf)
    assert v2 in labels.videos
    assert skeleton in labels.skeletons
    assert t in labels.tracks
    assert labels.find(v2, 0) == [lf]


def test_find_variants(skeleton, video):
    labels = make_labels(skeleton, video)
    assert [lf.frame_idx for lf in labels.find(video)] == [0, 1, 2, 3]
    assert labels.find(video, 2)[0].frame_idx == 2
    assert labels.find(video, [1, 3, 7]) == [labels[1], labels[3]]
    new = labels.find(video, [7], return_new=True)
    assert len(new) == 1 and new[0].frame_idx == 7 and len(new[0]) == 0
    assert labels.find_first(video).frame_idx == 0
    assert labels.find_last(video).frame_idx == 3
    other = Video.from_numpy(np.zeros((2, 8, 8, 1), np.uint8))
    assert labels.find(other) == []


def test_frames_iterator(skeleton, video):
    labels = make_labels(skeleton, video)
    # Reference semantics: ALL frames, rotated to start just after (before,
    # if reverse) from_frame_idx, wrapping (dataset.py find_fancy_frame_idxs).
    assert [lf.frame_idx for lf in labels.frames(video, from_frame_idx=1)] == [
        2,
        3,
        0,
        1,
    ]
    assert [
        lf.frame_idx for lf in labels.frames(video, from_frame_idx=2, reverse=True)
    ] == [1, 2, 3, 0]


def test_instance_views(skeleton, video):
    labels = make_labels(skeleton, video)
    assert len(labels.all_instances) == 8
    assert len(labels.user_instances) == 4
    assert len(labels.predicted_instances) == 4
    assert len(labels.user_labeled_frames) == 4
    assert labels.instance_count(video, 0) == 2


def test_get_track_occupancy(skeleton, video):
    labels = make_labels(skeleton, video)
    occ = labels.get_track_occupancy(video)
    t0 = labels.tracks[0]
    assert t0 in occ
    # Occupied on contiguous range [0, 4).
    assert occ[t0].list == [(0, 4)]
    assert occ[t0].start == 0


def test_remove_predictions(skeleton, video):
    labels = make_labels(skeleton, video)
    labels.remove_predictions()
    assert len(labels.predicted_instances) == 0
    assert len(labels) == 4  # user instances keep frames non-empty


def test_remove_untracked_and_empty(skeleton, video):
    lfs = [
        LabeledFrame(
            video=video, frame_idx=0, instances=[Instance(skeleton=skeleton)]
        ),
        LabeledFrame(
            video=video,
            frame_idx=1,
            instances=[Instance(skeleton=skeleton, track=Track(name="t"))],
        ),
    ]
    labels = Labels(labeled_frames=lfs)
    labels.remove_untracked_instances()
    assert len(labels) == 1
    assert labels[0].frame_idx == 1


def test_merge_matching_frames(skeleton, video):
    a = LabeledFrame(video=video, frame_idx=0, instances=[Instance(skeleton=skeleton)])
    b = LabeledFrame(video=video, frame_idx=0, instances=[Instance(skeleton=skeleton)])
    c = LabeledFrame(video=video, frame_idx=1, instances=[Instance(skeleton=skeleton)])
    labels = Labels(labeled_frames=[a, b, c])
    labels.merge_matching_frames()
    assert len(labels) == 2
    assert len(labels.find(video, 0)[0]) == 2


def test_extract_shares_then_copies(skeleton, video):
    labels = make_labels(skeleton, video)
    shared = labels.extract([0, 2])
    assert len(shared) == 2
    assert shared[0] is labels[0]  # shared objects
    assert shared.videos == [video]  # videos always shared

    copied = labels.extract([0], copy=True)
    assert copied[0] is not labels[0]
    assert copied[0].video is video  # video identity preserved by deepcopy memo
    copied[0].instances[0]["a"] = (99.0, 99.0)
    assert labels[0].instances[0]["a"]["x"] != 99.0


def test_split_fraction_and_count(skeleton, video):
    labels = make_labels(skeleton, video)
    a, b = labels.split(0.5, seed=0)
    assert len(a) == 2 and len(b) == 2
    a2, b2 = labels.split(3, seed=1)
    assert len(a2) == 3 and len(b2) == 1
    # All frames accounted for, no overlap (on frame indices).
    got = sorted([lf.frame_idx for lf in a2] + [lf.frame_idx for lf in b2])
    assert got == [0, 1, 2, 3]


def test_split_single_frame_duplicates(skeleton, video):
    labels = make_labels(skeleton, video, n_frames=1)
    a, b = labels.split(0.5, seed=0)
    assert len(a) == 1 and len(b) == 1


def test_with_user_labels_only(skeleton, video):
    labels = make_labels(skeleton, video)
    user_only = labels.with_user_labels_only()
    assert len(user_only) == 4
    assert all(
        not inst.predicted for lf in user_only for inst in lf.instances
    )


def make_pred_labels(skeleton, video, n_frames=4, n_tracks=2):
    """Prediction-only frames with per-track points (no user instances)."""
    tracks = [Track(name=f"t{i}") for i in range(n_tracks)]
    lfs = []
    for fi in range(n_frames):
        insts = [
            PredictedInstance.from_arrays(
                np.array([[10.0 * t + fi, 0.0], [10.0 * t + fi, 1.0]]),
                np.array([0.5, 0.6]),
                0.9,
                skeleton,
                track=tracks[t],
            )
            for t in range(n_tracks)
        ]
        lfs.append(LabeledFrame(video=video, frame_idx=fi, instances=insts))
    return Labels(labeled_frames=lfs)


def test_numpy_tracked(skeleton, video):
    labels = make_pred_labels(skeleton, video)
    # all_frames=True spans the FULL video (8 frames), reference semantics.
    arr = labels.numpy()
    assert arr.shape == (8, 2, 2, 2)
    assert arr.dtype == np.float32
    np.testing.assert_allclose(arr[2, 0, 0], [2.0, 0.0])
    np.testing.assert_allclose(arr[3, 1, 0], [13.0, 0.0])
    assert np.isnan(arr[4:]).all()
    # all_frames=False spans only the labeled range.
    assert labels.numpy(all_frames=False).shape == (4, 2, 2, 2)
    # Video may be passed by index.
    assert labels.numpy(video=0).shape == (8, 2, 2, 2)


def test_numpy_prefers_user_instances(skeleton, video):
    # Frames with user instances export ONLY those (user > predicted), and
    # single-instance data is auto-untracked (n_tracks=1).
    labels = make_labels(skeleton, video)
    arr = labels.numpy()
    assert arr.shape == (8, 1, 2, 2)
    np.testing.assert_allclose(arr[2, 0, 0], [2.0, 0.0])


def test_numpy_confidence_channel(skeleton, video):
    labels = make_pred_labels(skeleton, video)
    arr = labels.numpy(return_confidence=True)
    assert arr.shape == (8, 2, 2, 3)
    assert arr[0, 1, 0, 2] == pytest.approx(0.5)
    # User instances carry NaN confidence.
    labels2 = make_labels(skeleton, video)
    arr2 = labels2.numpy(return_confidence=True)
    assert np.isnan(arr2[0, 0, 0, 2])


def test_numpy_untracked_mode(skeleton, video):
    labels = make_pred_labels(skeleton, video)
    for lf in labels:
        for inst in lf.instances:
            inst.track = None
    labels.tracks = []
    arr = labels.numpy(untracked=True)
    assert arr.shape == (8, 2, 2, 2)
    assert not np.isnan(arr).all()
    # Tracked mode with no tracks -> zero track columns.
    assert labels.numpy(untracked=False).shape == (8, 0, 2, 2)


def test_numpy_empty_video(skeleton, video):
    labels = Labels(videos=[video])
    assert labels.numpy(video=video).shape == (0, 0, 0, 2)
    with pytest.raises(IndexError):
        Labels().numpy()


def test_add_remove_video(skeleton, video):
    labels = make_labels(skeleton, video)
    v2 = Video.from_numpy(np.zeros((2, 8, 8, 1), np.uint8))
    labels.add_video(v2)
    assert v2 in labels.videos
    labels.remove_video(v2)
    assert v2 not in labels.videos
    # Removing a video drops its frames.
    labels.remove_video(video)
    assert len(labels) == 0


def test_repr(skeleton, video):
    labels = make_labels(skeleton, video)
    r = repr(labels)
    assert "labeled_frames=4" in r and "videos=1" in r


def test_merge(skeleton, video):
    labels = make_labels(skeleton, video, n_frames=2)
    v2 = Video.from_numpy(np.zeros((2, 8, 8, 1), np.uint8))
    other = Labels(
        labeled_frames=[
            LabeledFrame(
                video=v2, frame_idx=0, instances=[Instance(skeleton=skeleton)]
            )
        ]
    )
    labels.merge(other)
    assert len(labels) == 3
    assert v2 in labels.videos


def test_roundtrip_through_slp(skeleton, video, tmp_path):
    labels = make_labels(skeleton, video)
    out = str(tmp_path / "t.slp")
    labels.save(out)
    loaded = Labels.load_file(out)
    assert len(loaded) == 4
    np.testing.assert_allclose(
        loaded[0].instances[0].numpy(), labels[0].instances[0].numpy(), atol=1e-6
    )
    assert [t.name for t in loaded.tracks] == [t.name for t in labels.tracks]


def test_describe_and_analysis_exports(tmp_path):
    """Labels.describe/export/export_csv conveniences (reference
    dataset.py:1135,2035,2058) on the reference predictions fixture."""
    import contextlib
    import io
    import os

    import h5py
    import pytest

    from sleap_tpu.core.labels import load_file

    p = "/root/reference/tests/data/tracks/clip.predictions.slp"
    if not os.path.exists(p):
        pytest.skip("reference fixture unavailable")
    labels = load_file(p)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        labels.describe()
    text = buf.getvalue()
    assert "Frames (user/predicted)" in text and "Tracks:" in text

    h5p = str(tmp_path / "a.h5")
    labels.export(h5p)
    with h5py.File(h5p) as f:
        assert f["tracks"].shape[-1] == 1500  # transposed (reference layout)
        assert len(f["track_names"]) == 2

    csvp = str(tmp_path / "a.csv")
    labels.export_csv(csvp)
    header = open(csvp).readline()
    assert header.startswith("frame_idx,track")
