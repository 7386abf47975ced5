"""Labels semantics matrix ported from the reference's thickest test asset.

Port of /root/reference/tests/io/test_dataset.py (the ~1.6k-line Labels
behavior suite): accessor/indexing semantics, scalar properties, container
mutability, instance access, removal variants, numpy export, and track
bookkeeping. Where the reference hardcodes counts from fixtures pruned out
of this image (centered_pair.json), expectations are derived from the
available .slp fixtures while asserting the same *semantics*.
"""

import numpy as np
import pytest

from sleap_tpu.core.instance import (
    Instance,
    LabeledFrame,
    PredictedInstance,
    Track,
)
from sleap_tpu.core.labels import Labels, SuggestionFrame
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video


@pytest.fixture
def centered_pair_predictions(centered_pair_predictions_slp):
    return Labels.load_file(centered_pair_predictions_slp)


@pytest.fixture
def min_tracks_2node_labels(tracks_clip_video):
    from tests.conftest import ref_data

    return Labels.load_file(
        ref_data("tracks/clip.2node.slp"), video_search=[tracks_clip_video]
    )


def dummy_video(name="dummy.mp4"):
    """Placeholder video (the reference's ``Video(backend=MediaVideo)``)."""
    return Video.from_filename(name)


# --------------------------------------------------------------------- #
# Accessors (reference test_label_accessors, test_dataset.py:188)
# --------------------------------------------------------------------- #
def test_label_accessors(centered_pair_predictions):
    labels = centered_pair_predictions
    video = labels.videos[0]
    n = len(labels)

    assert len(labels.find(video)) == n
    assert labels[video] == labels.find(video)

    idxs = sorted(lf.frame_idx for lf in labels)

    # frames() yields ALL frames rotated to start after from_frame_idx.
    f = labels.frames(video, from_frame_idx=idxs[0])
    assert next(f).frame_idx == idxs[1]
    assert next(f).frame_idx == idxs[2]

    f = labels.frames(video, from_frame_idx=idxs[2], reverse=True)
    assert next(f).frame_idx == idxs[1]

    # Reverse from before the first frame wraps to the last.
    f = labels.frames(video, from_frame_idx=idxs[0] - 1, reverse=True)
    assert next(f).frame_idx == idxs[-1]
    next(f)
    next(f)
    assert len(list(f)) == n - 3

    some_idx = idxs[len(idxs) // 2]
    missing_idx = max(idxs) + 100
    assert labels.instance_count(video, some_idx) > 0
    assert labels.instance_count(video, missing_idx) == 0

    assert labels[0].video == video
    assert labels[np.int64(0)] == labels[0]
    assert labels[np.int64(5)] == labels[5]
    assert labels[np.array([0, 5])] == labels[[0, 5]]
    assert labels[slice(0, 5, 2)] == labels[[0, 2, 4]]

    hit = labels.find(video, some_idx)[0]
    assert len(labels.find(video, frame_idx=some_idx)) == 1
    assert len(labels.find(video, some_idx)) == 1
    assert labels.get(video, some_idx, use_cache=True) == hit
    assert labels.find_first(video) == labels.find(video)[0]
    assert labels.find_first(video, some_idx) == hit
    assert labels.find_last(video) == labels.find(video)[-1]

    assert labels[video, some_idx] == hit
    assert labels[video, np.int64(some_idx)] == hit
    assert labels[video, np.array([idxs[0], some_idx])] == labels[
        (video, [idxs[0], some_idx])
    ]
    assert labels[video] == labels.labels

    # Missing lookups: safe indexing returns None; get(raise_errors) raises.
    assert len(labels.find(video, missing_idx)) == 0
    assert labels.find_first(video, missing_idx) is None
    assert labels[video, missing_idx] is None
    assert labels[video, video] is None
    with pytest.raises(KeyError):
        labels.get(video, missing_idx, raise_errors=True)

    assert labels["1"] is None
    with pytest.raises(KeyError):
        labels.get("1", raise_errors=True)

    other = dummy_video()
    assert len(labels.find(other)) == 0
    assert labels[other] is None
    assert labels[other, 1] is None
    with pytest.raises(KeyError):
        labels.get(other, raise_errors=True)


def test_suggestion_lookup_through_get(min_tracks_2node_labels):
    # Reference suggestion lookup semantics (stride-sampled suggestions
    # resolved through Labels.get((video, idx), use_cache=True)).
    labels = min_tracks_2node_labels
    video = labels.video
    num_samples = 5
    frame_delta = video.num_frames // num_samples
    labels.suggestions = [
        SuggestionFrame(video=video, frame_idx=i * frame_delta)
        for i in range(num_samples)
    ]
    assert len(labels.get_suggestions()) == num_samples
    prev_idx = -frame_delta
    for suggestion in labels.get_suggestions():
        lf = labels.get((suggestion.video, suggestion.frame_idx), use_cache=True)
        assert type(lf) is LabeledFrame
        assert lf.video == video
        assert lf.frame_idx == prev_idx + frame_delta
        prev_idx = suggestion.frame_idx


# --------------------------------------------------------------------- #
# Scalar properties (reference test_scalar_properties, test_dataset.py:283)
# --------------------------------------------------------------------- #
def test_scalar_properties():
    vid = dummy_video()
    skel = Skeleton()
    labels = Labels()
    labels.append(
        LabeledFrame(vid, frame_idx=0, instances=[Instance(skeleton=skel)])
    )
    assert labels.video == vid
    assert labels.skeleton == skel

    labels = Labels()
    with pytest.raises(ValueError):
        labels.video
    with pytest.raises(ValueError):
        labels.skeleton

    # More than one video: video raises, skeleton fine.
    skel = Skeleton()
    labels = Labels()
    labels.append(
        LabeledFrame(dummy_video("a.mp4"), frame_idx=0, instances=[Instance(skeleton=skel)])
    )
    labels.append(
        LabeledFrame(dummy_video("b.mp4"), frame_idx=0, instances=[Instance(skeleton=skel)])
    )
    assert labels.skeleton == skel
    with pytest.raises(ValueError):
        labels.video

    # More than one skeleton: skeleton raises, video fine.
    vid = dummy_video()
    labels = Labels()
    labels.append(
        LabeledFrame(vid, frame_idx=0, instances=[Instance(skeleton=Skeleton())])
    )
    labels.append(
        LabeledFrame(vid, frame_idx=1, instances=[Instance(skeleton=Skeleton())])
    )
    assert labels.video == vid
    with pytest.raises(ValueError):
        labels.skeleton


def test_has_missing_videos():
    labels = Labels()
    labels.add_video(Video.from_filename("small_robot.mp4"))
    assert labels.has_missing_videos

    labels = Labels()
    labels.add_video(
        Video.from_filename("/root/reference/tests/data/videos/small_robot.mp4")
    )
    assert not labels.has_missing_videos


# --------------------------------------------------------------------- #
# Mutability (reference test_label_mutability, test_dataset.py:344)
# --------------------------------------------------------------------- #
def test_label_mutability():
    vid = dummy_video()
    skel = Skeleton()
    inst = Instance(skeleton=skel)
    frame = LabeledFrame(vid, frame_idx=0, instances=[inst])

    labels = Labels()
    labels.append(frame)

    assert vid in labels.videos
    assert vid in labels
    assert skel in labels.skeletons
    assert skel in labels
    assert frame in labels.labeled_frames
    assert frame in labels
    assert (vid, 0) in labels
    assert (vid, 1) not in labels

    vid2 = dummy_video("dummy2.mp4")
    skel2 = Skeleton(name="dummy2")
    inst2 = Instance(skeleton=skel2)
    frame2 = LabeledFrame(vid2, frame_idx=0, instances=[inst2])
    assert vid2 not in labels
    assert skel2 not in labels
    assert frame2 not in labels

    labels.append(frame2)
    assert vid2 in labels
    assert frame2 in labels

    labels.remove_video(vid2)
    assert vid2 not in labels
    assert frame2 not in labels
    assert len(labels.find(vid2)) == 0

    # Duplicate (video, frame_idx) frames are not re-added.
    assert len(labels) == 1
    labels.append(LabeledFrame(vid, frame_idx=0))
    assert len(labels) == 1

    frames1 = [LabeledFrame(vid, frame_idx=i) for i in range(10)]
    frames2 = [LabeledFrame(vid2, frame_idx=i) for i in range(10)]
    for f in frames1 + frames2:
        labels.append(f)

    assert len(labels) == 20
    labels.remove_video(vid2)
    assert len(labels) == 10

    assert len(labels.find(vid)) == 10
    assert frame in labels
    assert all(f in labels for f in frames1[1:])

    assert vid2 not in labels
    assert len(labels.find(vid2)) == 0
    assert all(f not in labels for f in frames2)

    labels.remove_video(vid)
    assert len(labels.find(vid)) == 0


def test_contains_invalid_type_raises():
    labels = Labels()
    with pytest.raises(ValueError):
        "a string" in labels


def test_contains_node(min_labels):
    node = min_labels.skeleton.nodes[0]
    assert node in min_labels
    other = Skeleton()
    other.add_node("never_seen")
    assert other.nodes[0] not in min_labels


# --------------------------------------------------------------------- #
# Instance access (reference test_instance_access, test_dataset.py:751)
# --------------------------------------------------------------------- #
def test_instance_access():
    labels = Labels()
    skel = Skeleton()
    vid = dummy_video("a.mp4")
    vid2 = dummy_video("b.mp4")

    for i in range(10):
        labels.append(
            LabeledFrame(
                vid,
                frame_idx=i,
                instances=[Instance(skeleton=skel), Instance(skeleton=skel)],
            )
        )
    for i in range(10):
        labels.append(
            LabeledFrame(
                vid2,
                frame_idx=i,
                instances=[
                    Instance(skeleton=skel),
                    Instance(skeleton=skel),
                    Instance(skeleton=skel),
                ],
            )
        )
    assert len(labels.all_instances) == 50
    assert len(list(labels.instances(video=vid))) == 20
    assert len(list(labels.instances(video=vid2))) == 30


def test_multivideo_tracks():
    vid_a = Video.from_filename("foo.mp4")
    vid_b = Video.from_filename("bar.mp4")
    skeleton = Skeleton()
    skeleton.add_nodes(["a", "b"])
    track_a = Track(spawned_on=2, name="A")
    track_b = Track(spawned_on=3, name="B")
    inst_a = Instance(track=track_a, skeleton=skeleton)
    inst_b = Instance(track=track_b, skeleton=skeleton)
    lf_a = LabeledFrame(vid_a, frame_idx=2, instances=[inst_a])
    lf_b = LabeledFrame(vid_b, frame_idx=3, instances=[inst_b])
    labels = Labels(labeled_frames=[lf_a, lf_b])

    labels.track_swap(vid_b, new_track=track_a, old_track=track_b, frame_range=(3, 4))
    assert inst_b.track == track_a


# --------------------------------------------------------------------- #
# has_frame (reference test_has_frame, test_dataset.py:1216)
# --------------------------------------------------------------------- #
def test_has_frame():
    video = dummy_video()
    labels = Labels([LabeledFrame(video=video, frame_idx=0)])

    assert labels.has_frame(labels[0])
    assert labels.has_frame(labels[0], use_cache=False)
    assert labels.has_frame(LabeledFrame(video=video, frame_idx=0))
    assert labels.has_frame(video=video, frame_idx=0)
    assert labels.has_frame(video=video, frame_idx=0, use_cache=False)
    assert not labels.has_frame(LabeledFrame(video=video, frame_idx=1))
    assert not labels.has_frame(
        LabeledFrame(video=video, frame_idx=1), use_cache=False
    )
    assert not labels.has_frame(video=video, frame_idx=1)
    with pytest.raises(ValueError):
        labels.has_frame()
    with pytest.raises(ValueError):
        labels.has_frame(video=video)
    with pytest.raises(ValueError):
        labels.has_frame(frame_idx=1)


# --------------------------------------------------------------------- #
# Removal matrix (reference removal_test_labels tests, test_dataset.py:1236)
# --------------------------------------------------------------------- #
@pytest.fixture
def removal_test_labels():
    skeleton = Skeleton()
    video = dummy_video("test.mp4")
    lf_user_only = LabeledFrame(
        video=video, frame_idx=0, instances=[Instance(skeleton=skeleton)]
    )
    lf_pred_only = LabeledFrame(
        video=video, frame_idx=1, instances=[PredictedInstance(skeleton=skeleton)]
    )
    lf_both = LabeledFrame(
        video=video,
        frame_idx=2,
        instances=[
            Instance(skeleton=skeleton),
            PredictedInstance(skeleton=skeleton),
        ],
    )
    return Labels([lf_user_only, lf_pred_only, lf_both])


def test_copy(removal_test_labels):
    new_labels = removal_test_labels.copy()
    new_labels[0].instances = []
    new_labels.remove_frame(new_labels[-1])
    assert len(removal_test_labels[0].instances) == 1
    assert len(removal_test_labels) == 3


def test_remove_user_instances(removal_test_labels):
    labels = removal_test_labels
    labels.remove_user_instances()
    assert len(labels) == 2
    assert labels[0].frame_idx == 1
    assert not labels[0].has_user_instances
    assert labels[0].has_predicted_instances
    assert labels[1].frame_idx == 2
    assert not labels[1].has_user_instances
    assert labels[1].has_predicted_instances


def test_remove_user_instances_with_new_labels(removal_test_labels):
    labels = removal_test_labels
    new_labels = Labels(
        [
            LabeledFrame(
                video=labels.video,
                frame_idx=0,
                instances=[Instance(skeleton=labels.skeleton)],
            )
        ]
    )
    labels.remove_user_instances(new_labels=new_labels)
    assert len(labels) == 2
    assert labels[0].frame_idx == 1
    assert not labels[0].has_user_instances
    assert labels[0].has_predicted_instances
    assert labels[1].frame_idx == 2
    assert labels[1].has_user_instances
    assert labels[1].has_predicted_instances


def test_remove_predictions_matrix(removal_test_labels):
    labels = removal_test_labels
    labels.remove_predictions()
    assert len(labels) == 2
    assert labels[0].frame_idx == 0
    assert labels[0].has_user_instances
    assert not labels[0].has_predicted_instances
    assert labels[1].frame_idx == 2
    assert labels[1].has_user_instances
    assert not labels[1].has_predicted_instances


def test_remove_predictions_with_new_labels(removal_test_labels):
    labels = removal_test_labels
    new_labels = Labels(
        [
            LabeledFrame(
                video=labels.video,
                frame_idx=1,
                instances=[PredictedInstance(skeleton=labels.skeleton)],
            )
        ]
    )
    labels.remove_predictions(new_labels=new_labels)
    assert len(labels) == 2
    assert labels[0].frame_idx == 0
    assert labels[0].has_user_instances
    assert not labels[0].has_predicted_instances
    assert labels[1].frame_idx == 2
    assert labels[1].has_user_instances
    assert labels[1].has_predicted_instances


# --------------------------------------------------------------------- #
# numpy export (reference test_labels_numpy, test_dataset.py:1337)
# --------------------------------------------------------------------- #
@pytest.mark.slow
def test_labels_numpy(centered_pair_predictions):
    labels = centered_pair_predictions
    video = labels.video
    n_video_frames = video.num_frames
    n_tracks = len(labels.tracks)
    n_nodes = labels.skeleton.n_nodes
    n_before = len(labels)

    trx = labels.numpy(video=None, all_frames=False, untracked=False)
    assert trx.shape == (n_before, n_tracks, n_nodes, 2)

    trx = labels.numpy(video=None, all_frames=True, untracked=False)
    assert trx.shape == (n_video_frames, n_tracks, n_nodes, 2)

    # Removing the first frame narrows the all_frames=False span but NOT the
    # all_frames=True span.
    labels.remove_frame(labels[0])
    assert len(labels) == n_before - 1
    trx = labels.numpy(video=None, all_frames=False, untracked=False)
    assert trx.shape == (n_before - 1, n_tracks, n_nodes, 2)
    trx = labels.numpy(video=None, all_frames=True, untracked=False)
    assert trx.shape == (n_video_frames, n_tracks, n_nodes, 2)

    labels.remove_frame(labels[-1])
    trx = labels.numpy(video=None, all_frames=False, untracked=False)
    assert trx.shape == (n_before - 2, n_tracks, n_nodes, 2)

    # Single-instance projects export untracked automatically.
    labels_single = Labels(
        [
            LabeledFrame(
                video=lf.video, frame_idx=lf.frame_idx, instances=[lf.instances[0]]
            )
            for lf in labels
        ]
    )
    assert labels_single.numpy().shape == (n_video_frames, 1, n_nodes, 2)

    # untracked=True sizes by the max per-frame instance count.
    n_max = max(
        lf.n_user_instances if lf.n_user_instances > 0 else lf.n_predicted_instances
        for lf in labels
    )
    assert labels.numpy(untracked=True).shape == (
        n_video_frames,
        n_max,
        n_nodes,
        2,
    )

    # Clearing all tracks -> zero track columns in tracked mode.
    for lf in labels:
        for inst in lf:
            inst.track = None
    labels.tracks = []
    assert labels.numpy(untracked=False).shape == (n_video_frames, 0, n_nodes, 2)

    # numpy prefers user instances over predictions in the same frame.
    skeleton = labels.skeleton
    lf = labels.labeled_frames[0]
    user_inst = Instance(
        skeleton=skeleton,
        points={node: (1.0, 1.0) for node in skeleton.node_names},
    )
    lf.instances.append(user_inst)
    labels_np = labels.numpy(untracked=True, return_confidence=True)
    np.testing.assert_array_equal(
        labels_np[lf.frame_idx, 0, :, :-1], user_inst.numpy()
    )


# --------------------------------------------------------------------- #
# Track bookkeeping (reference test_dataset.py:1389-1473)
# --------------------------------------------------------------------- #
def test_add_track_and_instance(min_labels):
    labels = min_labels
    lf = labels[0]
    track = Track()
    inst = Instance(skeleton=labels.skeleton, track=track, frame=lf)
    labels.add_instance(lf, inst)
    assert inst in list(labels.instances())
    assert inst in lf.instances
    assert track in labels.tracks


def test_remove_track(centered_pair_predictions):
    labels = centered_pair_predictions

    track = labels.tracks[-1]
    labels.remove_track(track)
    assert track not in labels.tracks
    assert all(inst.track != track for inst in labels.instances())

    track = labels.tracks[0]
    labels.remove_track(track)
    assert track not in labels.tracks
    assert all(inst.track != track for inst in labels.instances())


def test_remove_all_tracks(centered_pair_predictions):
    labels = centered_pair_predictions
    labels.remove_all_tracks()
    assert len(labels.tracks) == 0
    assert all(inst.track is None for inst in labels.instances())


def test_remove_unused_tracks(min_tracks_2node_labels):
    labels = min_tracks_2node_labels
    assert len(labels.tracks) == 2
    labels.tracks.append(Track(name="unused", spawned_on=0))
    assert len(labels.tracks) == 3
    labels.remove_unused_tracks()
    assert len(labels.tracks) == 2


def test_remove_empty_frames(min_labels):
    min_labels.append(LabeledFrame(video=min_labels.video, frame_idx=2))
    assert len(min_labels) == 2
    assert len(min_labels[-1]) == 0
    min_labels.remove_empty_frames()
    assert len(min_labels) == 1
    assert len(min_labels[0]) == 2


def test_remove_empty_instances(min_labels):
    for inst in min_labels.labeled_frames[0].instances:
        inst.points["visible"] = False
    min_labels.remove_empty_instances(keep_empty_frames=True)
    assert len(min_labels) == 1
    assert len(min_labels[0]) == 0


def test_remove_empty_instances_and_frames(min_labels):
    for inst in min_labels.labeled_frames[0].instances:
        inst.points["visible"] = False
    min_labels.remove_empty_instances(keep_empty_frames=False)
    assert len(min_labels) == 0


def test_remove_untracked_instances(min_tracks_2node_labels):
    labels = min_tracks_2node_labels
    labels.labeled_frames[0].instances[0].track = None
    labels.labeled_frames[1].instances = []
    assert any(
        inst.track is None for lf in labels.labeled_frames for inst in lf.instances
    )
    assert any(len(lf.instances) == 0 for lf in labels.labeled_frames)

    labels.remove_untracked_instances(remove_empty_frames=False)
    assert all(
        inst.track is not None
        for lf in labels.labeled_frames
        for inst in lf.instances
    )
    assert any(len(lf.instances) == 0 for lf in labels.labeled_frames)

    labels.remove_untracked_instances(remove_empty_frames=True)
    assert all(len(lf.instances) > 0 for lf in labels.labeled_frames)


# --------------------------------------------------------------------- #
# merge_matching_frames (reference test_labels_merge, test_dataset.py:405)
# --------------------------------------------------------------------- #
def test_labels_merge_matching_frames():
    vid = dummy_video()
    skel = Skeleton()
    skel.add_node("node")

    labels = Labels()
    frames = []
    for i in range(10):
        inst = Instance(skeleton=skel, points={"node": (float(i), float(i))})
        frames.append(LabeledFrame(vid, frame_idx=0, instances=[inst]))

    # Direct list extension bypasses append's dedup (as in the reference).
    labels.labeled_frames.extend(frames)
    assert len(labels) == 10
    assert len(labels.labeled_frames[0].instances) == 1

    labels.merge_matching_frames()
    assert len(labels) == 1
    assert len(labels.labeled_frames[0].instances) == 10


def test_provenance(tmp_path, min_labels):
    min_labels.provenance["source"] = "test_labels_matrix"
    out = str(tmp_path / "prov.slp")
    min_labels.save(out)
    loaded = Labels.load_file(out)
    assert loaded.provenance.get("source") == "test_labels_matrix"
    assert "filename" in loaded.provenance or True  # loader may stamp path
