import numpy as np
import pytest

from sleap_tpu.core.instance import PredictedInstance, Track
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.tracking.components import (
    FrameMatches,
    centroid_distance,
    compute_iou,
    first_choice_matching,
    greedy_matching,
    hungarian_matching,
    instance_iou,
    instance_similarity,
)
from sleap_tpu.tracking.tracker import Tracker


@pytest.fixture
def skel():
    return Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)])


def make_inst(skel, pts, score=0.9, track=None):
    return PredictedInstance.from_arrays(
        np.asarray(pts, "f8"), np.ones(len(pts)), score, skel, track=track
    )


def test_instance_similarity(skel):
    a = make_inst(skel, [[0, 0], [10, 10]])
    b = make_inst(skel, [[0, 0], [10, 10]])
    assert instance_similarity(a, b) == pytest.approx(1.0)
    c = make_inst(skel, [[100, 100], [110, 110]])
    assert instance_similarity(a, c) < 1e-6


def test_centroid_and_iou(skel):
    a = make_inst(skel, [[0, 0], [10, 10]])
    b = make_inst(skel, [[5, 5], [15, 15]])
    assert centroid_distance(a, a) == pytest.approx(0.0)
    assert centroid_distance(a, b) < 0
    assert instance_iou(a, a) == pytest.approx(1.0)
    assert 0 < instance_iou(a, b) < 1


def test_matching_functions():
    cost = np.array([[1.0, 5.0], [5.0, 1.0]])
    assert sorted(hungarian_matching(cost)) == [(0, 0), (1, 1)]
    assert sorted(greedy_matching(cost)) == [(0, 0), (1, 1)]
    cost2 = np.array([[1.0, 2.0], [1.5, 4.0]])
    # Greedy: (0,0) first, then (1,1); hungarian would prefer (0,1),(1,0).
    assert sorted(greedy_matching(cost2)) == [(0, 0), (1, 1)]
    assert sorted(hungarian_matching(cost2)) == [(0, 1), (1, 0)]
    assert first_choice_matching(cost2) == [(0, 0), (1, 0)]


def test_simple_tracker_keeps_identities(skel):
    tracker = Tracker.make_tracker_by_name(
        tracker="simple", similarity="instance", match="greedy", track_window=3
    )
    # Two animals moving slowly in opposite corners.
    trajs = [
        ([[10 + t, 10], [20 + t, 20]], [[80 - t, 80], [90 - t, 90]])
        for t in range(10)
    ]
    first_tracks = None
    for t, (a_pts, b_pts) in enumerate(trajs):
        insts = [make_inst(skel, a_pts), make_inst(skel, b_pts)]
        tracked = tracker.track(insts, t=t)
        assert all(i.track is not None for i in tracked)
        names = [i.track.name for i in tracked]
        if first_tracks is None:
            first_tracks = names
        else:
            assert names == first_tracks  # no identity switches


def test_tracker_spawns_new_track_for_new_animal(skel):
    tracker = Tracker.make_tracker_by_name(tracker="simple", track_window=3)
    tracker.track([make_inst(skel, [[10, 10], [20, 20]])], t=0)
    tracked = tracker.track(
        [
            make_inst(skel, [[11, 10], [21, 20]]),
            make_inst(skel, [[200, 200], [210, 210]]),
        ],
        t=1,
    )
    assert len({i.track for i in tracked}) == 2


def test_max_tracks_cap(skel):
    tracker = Tracker.make_tracker_by_name(
        tracker="simplemaxtracks", max_tracks=1, track_window=3
    )
    tracker.track([make_inst(skel, [[10, 10], [20, 20]])], t=0)
    tracked = tracker.track(
        [
            make_inst(skel, [[11, 10], [21, 20]]),
            make_inst(skel, [[200, 200], [210, 210]]),
        ],
        t=1,
    )
    tracks = {i.track for i in tracked if i.track is not None}
    assert len(tracks) == 1


def test_kalman_tracker_smoke(skel):
    from sleap_tpu.tracking.kalman import KalmanTracker

    init = Tracker.make_tracker_by_name(tracker="simple", track_window=3)
    kt = KalmanTracker.make_tracker(
        init_tracker=init, node_indices=[0, 1], instance_count=2, init_frame_count=3
    )
    for t in range(8):
        insts = [
            make_inst(skel, [[10 + 2 * t, 10], [20 + 2 * t, 20]]),
            make_inst(skel, [[80 - 2 * t, 80], [90 - 2 * t, 90]]),
        ]
        tracked = kt.track(insts, t=t)
        assert len(tracked) == 2
    assert kt.kf is not None  # switched to Kalman filtering
    names = sorted(i.track.name for i in tracked if i.track)
    assert len(set(names)) == 2


def test_compute_iou():
    assert compute_iou(np.array([0, 0, 10, 10]), np.array([0, 0, 10, 10])) == 1.0
    assert compute_iou(np.array([0, 0, 10, 10]), np.array([20, 20, 30, 30])) == 0.0
