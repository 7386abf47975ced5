"""Max-tracking gap scenarios.

Ports the reference's ``tests/nn/test_tracker_components.py::
test_max_tracking_*`` (reference sleap/nn/tracking.py:1194): when detections
vanish for longer than the track window, a plain simple tracker spawns new
tracks on reappearance, while max_tracking with ``max_tracks=2`` re-uses the
capped track set instead.
"""

import numpy as np

from sleap_tpu.core.instance import PredictedInstance
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.tracking.tracker import Tracker


def make_insts(trx):
    skel = Skeleton.from_names_and_edge_inds(
        ["A", "B", "C"], edge_inds=[[0, 1], [1, 2]]
    )

    def make_inst(x, y):
        pts = np.array([[-0.1, -0.1], [0.0, 0.0], [0.1, 0.1]]) + np.array([[x, y]])
        return PredictedInstance.from_arrays(
            pts, np.ones(3), 1.0, skel
        )

    return [[make_inst(x, y) for x, y in frame] for frame in trx]


def _run(tracker, preds):
    tracked = []
    for insts in preds:
        tracked.append(tracker.track(insts, img_hw=(1, 1)))
    return list({inst.track for frame in tracked for inst in frame})


def test_max_tracking_large_gap_single_track():
    # One of two animals vanishes for longer than the track window.
    preds = make_insts(
        [
            [(0, 0), (0, 1)],
            [(0.1, 0), (0.1, 1)],
            [(0.2, 0), (0.2, 1)],
            [(0.3, 0)],
            [(0.4, 0)],
            [(0.5, 0), (0.5, 1)],
            [(0.6, 0), (0.6, 1)],
        ]
    )

    tracker = Tracker.make_tracker_by_name(
        tracker="simple", match="hungarian", track_window=2
    )
    assert len(_run(tracker, preds)) == 3  # reappearance spawns a new track

    tracker = Tracker.make_tracker_by_name(
        tracker="simplemaxtracks",
        match="hungarian",
        track_window=2,
        max_tracks=2,
        max_tracking=True,
    )
    assert len(_run(tracker, preds)) == 2  # capped: reappearance re-uses


def test_max_tracking_small_gap_on_both_tracks():
    # BOTH animals vanish for longer than the window.
    preds = make_insts(
        [
            [(0, 0), (0, 1)],
            [(0.1, 0), (0.1, 1)],
            [(0.2, 0), (0.2, 1)],
            [],
            [],
            [(0.5, 0), (0.5, 1)],
            [(0.6, 0), (0.6, 1)],
        ]
    )

    tracker = Tracker.make_tracker_by_name(
        tracker="simple", match="hungarian", track_window=2
    )
    assert len(_run(tracker, preds)) == 4

    tracker = Tracker.make_tracker_by_name(
        tracker="simplemaxtracks",
        match="hungarian",
        track_window=2,
        max_tracks=2,
        max_tracking=True,
    )
    assert len(_run(tracker, preds)) == 2


def test_max_tracking_extra_detections():
    # A third (spurious) detection appears in the last frame.
    preds = make_insts(
        [
            [(0, 0), (0, 1)],
            [(0.1, 0), (0.1, 1)],
            [(0.2, 0), (0.2, 1)],
            [(0.3, 0)],
            [(0.4, 0)],
            [(0.5, 0), (0.5, 1)],
            [(0.6, 0), (0.6, 1), (0.6, 0.5)],
        ]
    )

    tracker = Tracker.make_tracker_by_name(
        tracker="simple", match="hungarian", track_window=2
    )
    assert len(_run(tracker, preds)) == 4

    tracker = Tracker.make_tracker_by_name(
        tracker="simplemaxtracks",
        match="hungarian",
        track_window=2,
        max_tracks=2,
        max_tracking=True,
    )
    # Extra detections above the cap stay untracked (track=None counts once).
    tracks = _run(tracker, preds)
    real = [t for t in tracks if t is not None]
    assert len(real) == 2
