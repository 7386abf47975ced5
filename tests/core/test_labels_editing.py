"""Labels editing APIs: instance add/remove, track editing, suggestions.

Reference analogs: dataset.py:1156 (instances), :1262-1380 (track ops),
:1385-1480 (suggestions), :1636 (has_frame), :811 (copy).
"""

import numpy as np
import pytest

from sleap_tpu.core.instance import Instance, LabeledFrame, Track
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video


@pytest.fixture
def labels():
    skel = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)])
    video = Video.from_numpy(np.zeros((8, 16, 16, 1), np.uint8))
    tA, tB = Track(0, "A"), Track(0, "B")
    lfs = [
        LabeledFrame(
            video=video, frame_idx=i,
            instances=[
                Instance(skeleton=skel, points=np.full((2, 2), float(i)), track=tA),
                Instance(skeleton=skel, points=np.full((2, 2), i + 10.0), track=tB),
            ],
        )
        for i in range(4)
    ]
    out = Labels(lfs)
    return out, video, skel, tA, tB


def test_has_frame_and_instances_iterator(labels):
    lbls, video, *_ = labels
    assert lbls.has_frame(video=video, frame_idx=2)
    assert lbls.has_frame(lf=lbls[0])
    assert not lbls.has_frame(video=video, frame_idx=7)
    assert not lbls.has_frame(video=video, frame_idx=7, use_cache=False)
    assert sum(1 for _ in lbls.instances()) == 8
    assert sum(1 for _ in lbls.instances(video=video)) == 8
    assert lbls.get_track_count(video) == 2


def test_track_swap_and_set_instance(labels):
    lbls, video, skel, tA, tB = labels
    lbls.track_swap(video, tB, tA, (1, 3))
    f1 = lbls.find(video, 1)[0]
    assert f1.instances[0].track is tB and f1.instances[1].track is tA
    f0 = lbls.find(video, 0)[0]
    assert f0.instances[0].track is tA  # outside the range: untouched

    tC = Track(0, "C")
    lbls.track_set_instance(f0, f0.instances[0], tC)
    assert f0.instances[0].track is tC
    assert tC in lbls.tracks


def test_pseudo_track_swap(labels):
    """An int old_track matches untracked instances by list index."""
    lbls, video, skel, tA, tB = labels
    f0 = lbls.find(video, 0)[0]
    f0.instances[0].track = None
    lbls.track_swap(video, tB, 0, (0, 1))
    assert f0.instances[0].track is tB
    # One-way: tB's prior occupant keeps its track.
    assert f0.instances[1].track is tB or f0.instances[1].track is None


def test_remove_tracks(labels):
    lbls, video, skel, tA, tB = labels
    lbls.remove_track(tA)
    assert tA not in lbls.tracks
    assert all(i.track is not tA for i in lbls.instances())
    lbls.remove_all_tracks()
    assert lbls.tracks == []
    assert all(i.track is None for i in lbls.instances())


def test_remove_unused_tracks(labels):
    lbls, video, skel, tA, tB = labels
    for inst in lbls.instances():
        if inst.track is tB:
            inst.track = None
    lbls.remove_unused_tracks()
    assert lbls.tracks == [tA]


def test_add_remove_instance(labels):
    lbls, video, skel, tA, tB = labels
    f0 = lbls[0]
    # Same-track user instance already in frame -> new instance loses track.
    dup = Instance(skeleton=skel, points=np.ones((2, 2)), track=tA)
    lbls.add_instance(f0, dup)
    assert dup.track is None and dup in f0.instances
    lbls.remove_instance(f0, dup)
    assert dup not in f0.instances
    # Novel track gets registered.
    tC = Track(0, "C")
    extra = Instance(skeleton=skel, points=np.ones((2, 2)), track=tC)
    lbls.add_instance(f0, extra)
    assert extra.track is tC and tC in lbls.tracks


def test_suggestions_api(labels):
    lbls, video, *_ = labels
    lbls.add_suggestion(video, 5)
    lbls.add_suggestion(video, 5)  # dedup
    lbls.add_suggestion(video, 2)
    assert len(lbls.suggestions) == 2
    assert lbls.get_video_suggestions(video) == [5, 2]
    # Frame 2 has user labels; frame 5 does not exist -> unlabeled.
    assert lbls.get_video_suggestions(video, user_labeled=False) == [5]
    assert [s.frame_idx for s in lbls.unlabeled_suggestions] == [5]
    assert lbls.get_unlabeled_suggestion_inds() == [0]
    assert lbls.find_suggestion(video, 2).frame_idx == 2

    assert lbls.get_next_suggestion(video, 3, 1).frame_idx == 5
    # On a suggestion: follows the list order (wrapping).
    assert lbls.get_next_suggestion(video, 5, 1).frame_idx == 2
    assert lbls.get_next_suggestion(video, 3, -1).frame_idx == 2

    lbls.remove_suggestion(video, 5)
    assert [s.frame_idx for s in lbls.suggestions] == [2]
    lbls.clear_suggestions()
    assert lbls.suggestions == []


def test_copy_is_deep_except_videos(labels):
    lbls, video, *_ = labels
    c = lbls.copy()
    assert len(c) == len(lbls) and c[0] is not lbls[0]
    assert c[0].video is lbls[0].video  # videos shared (live handles)
    c[0].instances[0].points["x"][0] = 99.0
    assert lbls[0].instances[0].points["x"][0] != 99.0
    assert list(c.tracks) == list(lbls.tracks)
    # Track identity must be consistent between registry and instances:
    # the copy's instances point at tracks that ARE in c.tracks.
    for inst in c.instances():
        if inst.track is not None:
            assert any(inst.track is t for t in c.tracks)


def test_per_format_loader_shims():
    """Labels.load_deeplabcut/alphatracker/json/leap_matlab classmethods
    (reference dataset.py:2185+) on the reference's own fixtures."""
    import os

    base = "/root/reference/tests/data"
    if not os.path.isdir(base):
        pytest.skip("reference fixtures unavailable")
    assert len(Labels.load_deeplabcut(
        os.path.join(base, "dlc/labeled-data/video/maudlc_testdata.csv"))) == 3
    assert len(Labels.load_alphatracker(
        os.path.join(base, "alphatracker/at_testdata.json"))) == 4
    assert len(Labels.load_json(
        os.path.join(base, "json_format_v2/minimal_instance.json"))) == 1
    mats = [f for f in os.listdir(os.path.join(base, "mat")) if f.endswith(".mat")]
    assert len(Labels.load_leap_matlab(os.path.join(base, "mat", mats[0]))) > 0


def test_frame_counts_and_multi_instance(labels):
    lbls, video, skel, tA, tB = labels
    assert lbls.get_labeled_frame_count() == 4
    assert lbls.get_labeled_frame_count(video, "user") == 4
    assert lbls.get_labeled_frame_count(video, "predicted") == 0
    with pytest.raises(ValueError):
        lbls.get_labeled_frame_count(filter="bogus")
    assert lbls.max_user_instances == 2
    assert lbls.min_user_instances == 2
    assert lbls.is_multi_instance
    assert Labels.make_video_callback(["/a", "/b"]) == ["/a", "/b"]


def test_save_frame_data(tmp_path, labels):
    """save_frame_data_imgstore / _hdf5 write per-video frame images
    (reference dataset.py:2239,2315)."""
    import h5py

    lbls, video, *_ = labels
    lbls.add_suggestion(video, 6)
    vids = lbls.save_frame_data_imgstore(str(tmp_path), suggested=True)
    assert len(vids) == 1
    assert vids[0].num_frames == 5  # 4 labeled + 1 suggested
    assert vids[0].get_frame(0).shape == (16, 16, 1)

    h5p = str(tmp_path / "fd.h5")
    vids2 = lbls.save_frame_data_hdf5(h5p, format="")
    with h5py.File(h5p) as f:
        assert set(f["video0"].keys()) == {"frame_numbers", "source_video", "video"}
    assert vids2[0].num_frames == 4


def test_merge_nodes():
    """merge_nodes keeps base data when present, else adopts the merged
    node's point, and deletes the node everywhere (reference
    dataset.py:2561)."""
    skel = Skeleton.from_names_and_edge_inds(
        ["head", "neck2", "neck", "tail"], [(0, 2), (2, 3)]
    )
    video = Video.from_numpy(np.zeros((2, 8, 8, 1), np.uint8))
    p1 = np.array([[1.0, 1.0], [5.0, 5.0], [np.nan, np.nan], [3.0, 3.0]])
    p2 = np.array([[1.0, 1.0], [7.0, 7.0], [2.0, 2.0], [3.0, 3.0]])
    lf = LabeledFrame(
        video=video, frame_idx=0,
        instances=[
            Instance(skeleton=skel, points=p1),
            Instance(skeleton=skel, points=p2),
        ],
    )
    lbls = Labels([lf])
    lbls.merge_nodes("neck", "neck2")
    assert lbls.skeleton.node_names == ["head", "neck", "tail"]
    np.testing.assert_allclose(lf.instances[0].numpy(), [[1, 1], [5, 5], [3, 3]])
    np.testing.assert_allclose(lf.instances[1].numpy(), [[1, 1], [2, 2], [3, 3]])


def test_complex_merge_between():
    """Conflict-aware merge (reference dataset.py:1767, instance.py:1749):
    clean merges land in base; two-sided unmatched extras come back as
    conflict frames; finish_complex_merge applies a resolution."""
    skel = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)])
    video = Video.from_numpy(np.zeros((4, 8, 8, 1), np.uint8))

    def inst(v):
        return Instance(skeleton=skel, points=np.full((2, 2), float(v)))

    # Clean: disjoint frames.
    base = Labels([LabeledFrame(video=video, frame_idx=0, instances=[inst(1)])])
    new = Labels([LabeledFrame(video=video, frame_idx=1, instances=[inst(2)])])
    merged, eb, en = Labels.complex_merge_between(base, new, unify=False)
    assert len(base) == 2 and not eb and not en
    assert merged[video][1][0].numpy()[0, 0] == 2

    # Clean: redundant match + extras on one side only.
    base = Labels([LabeledFrame(video=video, frame_idx=0, instances=[inst(1)])])
    new = Labels(
        [LabeledFrame(video=video, frame_idx=0, instances=[inst(1), inst(3)])]
    )
    _, eb, en = Labels.complex_merge_between(base, new, unify=False)
    assert not eb and not en and len(base[0].instances) == 2

    # Conflict: both sides have unmatched user instances.
    base = Labels(
        [LabeledFrame(video=video, frame_idx=0, instances=[inst(1), inst(4)])]
    )
    new = Labels(
        [LabeledFrame(video=video, frame_idx=0, instances=[inst(1), inst(5)])]
    )
    _, eb, en = Labels.complex_merge_between(base, new, unify=False)
    assert len(eb) == 1 and len(en) == 1
    assert len(base[0].instances) == 1  # only the perfect match retained
    Labels.finish_complex_merge(base, en)
    assert len(base) == 1 and len(base[0].instances) == 2


def test_save_frame_data_hdf5_user_labeled_false(tmp_path, labels):
    """user_labeled=False with suggested=True exports ONLY suggested frames
    (regression: the flag used to invert into all-labeled)."""
    import h5py

    lbls, video, *_ = labels
    lbls.add_suggestion(video, 6)
    h5p = str(tmp_path / "fd.h5")
    lbls.save_frame_data_hdf5(h5p, format="", user_labeled=False, suggested=True)
    with h5py.File(h5p) as f:
        assert list(f["video0"]["frame_numbers"][:]) == [6]


def test_get_next_suggestion_wraps_to_next_video():
    """Past the last suggestion in a video, navigation lands on the NEXT
    video's earliest suggestion (reference dataset.py:1483), never an
    earlier frame of the same video."""
    skel = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)])
    v1 = Video.from_numpy(np.zeros((30, 8, 8, 1), np.uint8))
    v2 = Video.from_numpy(np.full((30, 8, 8, 1), 9, np.uint8))
    lbls = Labels(
        [
            LabeledFrame(video=v1, frame_idx=0,
                         instances=[Instance(skeleton=skel, points=np.ones((2, 2)))]),
            LabeledFrame(video=v2, frame_idx=0,
                         instances=[Instance(skeleton=skel, points=np.ones((2, 2)))]),
        ]
    )
    lbls.add_suggestion(v1, 5)
    lbls.add_suggestion(v1, 10)
    lbls.add_suggestion(v2, 3)
    s = lbls.get_next_suggestion(v1, 20, 1)
    assert s.video is v2 and s.frame_idx == 3
    s = lbls.get_next_suggestion(v2, 1, -1)
    assert s.video is v1 and s.frame_idx == 10
