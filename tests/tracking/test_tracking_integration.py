"""Tracker integration tests on real data.

Repo analog of ``/root/reference/tests/nn/test_tracking_integration.py``:
tracker x similarity x matcher matrix over
``tests/data/tracks/clip.predictions.slp`` (1500 frames, 2 bees, 2 tracks),
plus the flow tracker on ``clip.mp4`` through the JAX LK path, and the
retrack CLI end-to-end.
"""

import os

import numpy as np
import pytest

import sleap_tpu
from sleap_tpu.core.labels import Labels
from sleap_tpu.tracking.tracker import Tracker, retrack, run_tracker

CLIP_PREDICTIONS = "/root/reference/tests/data/tracks/clip.predictions.slp"
CLIP_MP4 = "/root/reference/tests/data/tracks/clip.mp4"

SIMILARITIES = ["instance", "normalized_instance", "object_keypoint", "centroid", "iou"]
MATCHES = ["hungarian", "greedy"]


def _require(path):
    if not os.path.exists(path):
        pytest.skip(f"reference fixture unavailable: {path}")
    return path


@pytest.fixture(scope="module")
def clip_frames():
    _require(CLIP_PREDICTIONS)
    labels = Labels.load_file(CLIP_PREDICTIONS)
    return sorted(labels.labeled_frames, key=lambda lf: lf.frame_idx)


def _slice(frames, n):
    """Fresh copies of the first n frames with tracks cleared."""
    import copy

    out = []
    for lf in frames[:n]:
        insts = list(lf.instances)
        out.append(
            type(lf)(video=lf.video, frame_idx=lf.frame_idx, instances=insts)
        )
    return out


def _n_tracks(frames):
    return len({inst.track for lf in frames for inst in lf.instances if inst.track})


@pytest.mark.slow
@pytest.mark.parametrize("similarity", SIMILARITIES)
@pytest.mark.parametrize("match", MATCHES)
def test_simple_tracker_matrix(clip_frames, similarity, match):
    """Simple tracker over 50 real frames for every similarity x matcher."""
    tracker = Tracker.make_tracker_by_name(
        tracker="simple", similarity=similarity, match=match, track_window=5,
        target_instance_count=2, post_connect_single_breaks=True,
    )
    frames = _slice(clip_frames, 50)
    run_tracker(frames, tracker)
    # Two animals, consistently visible: tracking must converge to 2 IDs.
    assert _n_tracks(frames) == 2
    # Every instance ends up assigned.
    assert all(inst.track is not None for lf in frames for inst in lf.instances)


@pytest.mark.slow
@pytest.mark.parametrize("similarity", ["instance", "iou"])
def test_simplemaxtracks_matrix(clip_frames, similarity):
    tracker = Tracker.make_tracker_by_name(
        tracker="simplemaxtracks", similarity=similarity, match="hungarian",
        track_window=5, max_tracks=2,
    )
    frames = _slice(clip_frames, 50)
    run_tracker(frames, tracker)
    assert _n_tracks(frames) <= 2


@pytest.mark.slow
def test_track_identity_stability(clip_frames):
    """The two bees keep their IDs over a 100-frame window (no swaps under
    hungarian + instance similarity on clean predictions)."""
    tracker = Tracker.make_tracker_by_name(
        tracker="simple", similarity="instance", match="hungarian",
        track_window=5, target_instance_count=2,
    )
    frames = _slice(clip_frames, 100)
    run_tracker(frames, tracker)
    # Centroid continuity: per frame pair, the instance closest in space
    # keeps the same track name.
    prev = {}
    swaps = 0
    for lf in frames:
        cur = {}
        for inst in lf.instances:
            if inst.track is None:
                continue
            with np.errstate(all="ignore"):
                cur[inst.track.name] = np.nanmean(inst.numpy(), axis=0)
        if prev:
            for name, c in cur.items():
                if name in prev:
                    d_same = np.linalg.norm(c - prev[name])
                    d_other = min(
                        (
                            np.linalg.norm(c - p)
                            for n2, p in prev.items()
                            if n2 != name
                        ),
                        default=np.inf,
                    )
                    if d_other + 1e-6 < d_same:
                        swaps += 1
        prev = cur
    assert swaps <= 2, f"{swaps} identity swaps over 100 frames"


@pytest.mark.slow
def test_flow_tracker_on_real_video(clip_frames):
    """Flow-shift tracking through the JAX pyramidal LK op on clip.mp4."""
    _require(CLIP_MP4)
    tracker = Tracker.make_tracker_by_name(
        tracker="flow", similarity="instance", match="hungarian",
        track_window=5, img_scale=0.25, target_instance_count=2,
    )
    frames = _slice(clip_frames, 10)
    assert tracker.uses_image
    run_tracker(frames, tracker)
    assert _n_tracks(frames) == 2
    assert all(inst.track is not None for lf in frames for inst in lf.instances)


@pytest.mark.slow
def test_flowmaxtracks_on_real_video(clip_frames):
    _require(CLIP_MP4)
    tracker = Tracker.make_tracker_by_name(
        tracker="flowmaxtracks", similarity="instance", match="greedy",
        track_window=5, img_scale=0.25, max_tracks=2,
    )
    frames = _slice(clip_frames, 10)
    run_tracker(frames, tracker)
    assert _n_tracks(frames) <= 2


@pytest.mark.slow
def test_kalman_tracking_on_real_predictions(clip_frames):
    """Simple tracker -> Kalman filter handoff on real 2-bee predictions."""
    tracker = Tracker.make_tracker_by_name(
        tracker="simple", similarity="instance", match="hungarian",
        track_window=5, target_instance_count=2,
        kf_init_frame_count=10, kf_node_indices=[0, 1],
    )
    from sleap_tpu.tracking.kalman import KalmanTracker

    assert isinstance(tracker, KalmanTracker)
    frames = _slice(clip_frames, 60)
    run_tracker(frames, tracker)
    assert tracker.kf is not None, "Kalman filters never initialized"
    assert _n_tracks(frames) == 2


@pytest.mark.slow
def test_retrack_cli_e2e(clip_frames, tmp_path):
    """The retrack CLI (reference `python -m sleap.nn.tracking`) end-to-end."""
    from sleap_tpu.tracking.tracker import main

    out = str(tmp_path / "retracked.slp")
    main(
        [
            CLIP_PREDICTIONS,
            "-o", out,
            "--frames", "0-40",
            "--tracking.tracker", "simple",
            "--tracking.similarity", "instance",
            "--tracking.match", "hungarian",
        ]
    )
    labels = sleap_tpu.load_file(out)
    assert len(labels) == 41
    assert len(labels.tracks) >= 2
