"""Tests for the analysis utilities in sleap_tpu.info and io rendering.

Covers the reference's tests for ``sleap/info/{metrics,summary,align,
trackcleaner}.py`` and ``sleap/io/visuals.py`` surfaces against this
rebuild's implementations.
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
def skel():
    return Skeleton.from_names_and_edge_inds(["a", "b", "c"], [(0, 1), (1, 2)])


def _tracked_labels(skel, n_frames=4, drift=2.0):
    video = Video.from_numpy(np.zeros((n_frames, 64, 64, 1), "uint8"))
    t0, t1 = Track(name="t0"), Track(name="t1")
    frames = []
    for f in range(n_frames):
        insts = []
        for k, tr in enumerate((t0, t1)):
            pts = np.array(
                [[10.0 + 20 * k + drift * f, 10.0], [15.0 + 20 * k + drift * f, 15.0], [20.0 + 20 * k + drift * f, 20.0]]
            )
            insts.append(
                PredictedInstance.from_arrays(
                    pts, np.full(3, 0.9), 0.8 + 0.1 * k, skel, track=tr
                )
            )
        frames.append(LabeledFrame(video=video, frame_idx=f, instances=insts))
    return Labels(frames), video


# --------------------------------------------------------------------------- #
# info.metrics
# --------------------------------------------------------------------------- #


def test_matched_instance_distances(skel):
    from sleap_tpu.info.metrics import (
        match_instance_lists_nodewise,
        matched_instance_distances,
        point_dist,
    )

    video = Video.from_numpy(np.zeros((1, 64, 64, 1), "uint8"))
    pts = np.array([[0.0, 0.0], [5.0, 5.0], [10.0, 10.0]])
    a = Instance(skeleton=skel, points=pts)
    b = PredictedInstance.from_arrays(pts + 1.0, np.ones(3), 0.9, skel)
    lf_a = LabeledFrame(video=video, frame_idx=0, instances=[a])
    lf_b = LabeledFrame(video=video, frame_idx=0, instances=[b])
    la, lb = Labels([lf_a]), Labels([lf_b])
    frame_idxs, D, points_gt, points_pr = matched_instance_distances(
        la, lb, match_lists_function=match_instance_lists_nodewise
    )
    b = Instance(skeleton=skel, points=pts + 1.0)
    assert frame_idxs == [0]
    np.testing.assert_allclose(D, np.sqrt(2.0), atol=1e-6)
    np.testing.assert_allclose(point_dist(a, b), np.sqrt(2.0), atol=1e-6)


# --------------------------------------------------------------------------- #
# info.summary
# --------------------------------------------------------------------------- #


def test_statistic_series(skel):
    from sleap_tpu.info.summary import StatisticSeries

    labels, video = _tracked_labels(skel)
    stats = StatisticSeries(labels)

    counts = stats.get_point_count_series(video)
    assert counts == {f: 6 for f in range(4)}

    scores = stats.get_instance_score_series(video, reduction="sum")
    assert scores[0] == pytest.approx(1.7)

    disp = stats.get_point_displacement_series(video, reduction="mean")
    # Constant x-drift of 2 px/frame for every tracked node.
    for f in range(1, 4):
        assert disp[f] == pytest.approx(2.0)
    assert 0 not in disp  # no prior frame to diff against


# --------------------------------------------------------------------------- #
# info.align
# --------------------------------------------------------------------------- #


def test_align_instance_points_recovers_rotation():
    from sleap_tpu.info.align import align_instance_points

    rng = np.random.RandomState(3)
    src = rng.rand(5, 2) * 10
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    dst = src @ R.T
    aligned = align_instance_points(src, dst)
    np.testing.assert_allclose(aligned, dst, atol=1e-6)


def test_align_instances_rotated_copies_collapse(skel):
    from sleap_tpu.info.align import align_instances, get_instances_points

    rng = np.random.RandomState(0)
    base = rng.rand(3, 2) * 20
    all_points = []
    for theta in (0.0, 0.4, -0.3):
        R = np.array(
            [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
        )
        all_points.append(base @ R.T)
    aligned = align_instances(np.stack(all_points), node_a=0, node_b=1)
    # Rotated copies of the same geometry collapse onto one shape.
    np.testing.assert_allclose(aligned[1], aligned[0], atol=1e-5)
    np.testing.assert_allclose(aligned[2], aligned[0], atol=1e-5)
    # node_a at origin, node_a->node_b on the vertical axis.
    np.testing.assert_allclose(aligned[0][0], [0.0, 0.0], atol=1e-8)
    assert abs(aligned[0][1][0]) < 1e-6
    insts = [Instance(skeleton=skel, points=p) for p in all_points]
    assert get_instances_points(insts).shape == (3, 3, 2)


# --------------------------------------------------------------------------- #
# info.trackcleaner CLI
# --------------------------------------------------------------------------- #


def test_trackcleaner_cli(skel, tmp_path):
    from sleap_tpu.info.trackcleaner import fit_tracks

    labels, video = _tracked_labels(skel)
    src = str(tmp_path / "preds.slp")
    labels.save(src)
    out = fit_tracks(src, instance_count=2)
    reloaded = Labels.load_file(out)
    assert len(reloaded) == 4
    tracks = {
        inst.track.name for lf in reloaded for inst in lf.instances if inst.track
    }
    assert len(tracks) == 2


# --------------------------------------------------------------------------- #
# info.labels (sleap-inspect)
# --------------------------------------------------------------------------- #


def test_describe_labels(skel, tmp_path, capsys):
    from sleap_tpu.info.labels import describe_labels

    labels, _ = _tracked_labels(skel)
    path = str(tmp_path / "x.slp")
    labels.save(path)
    describe_labels(path)
    out = capsys.readouterr().out
    assert "Video files:" in out or "videos" in out.lower()


# --------------------------------------------------------------------------- #
# io.visuals + io.videowriter (sleap-render)
# --------------------------------------------------------------------------- #


def test_render_frame_draws_markers(skel):
    from sleap_tpu.io.visuals import render_frame

    labels, video = _tracked_labels(skel)
    img = video.get_frame(0)
    out = render_frame(labels, img, 0, video=video)
    assert out.shape[-1] == 3
    assert out.any()  # something was drawn on the black frame


def test_save_labeled_video(skel, tmp_path):
    from sleap_tpu.io.visuals import save_labeled_video

    labels, video = _tracked_labels(skel)
    out_path = str(tmp_path / "render.mp4")
    save_labeled_video(out_path, labels, video=video, frames=[0, 1, 2], fps=5)
    rendered = Video.from_filename(out_path)
    assert rendered.num_frames == 3
    assert rendered.get_frame(0).any()


def test_sleap_render_cli(skel, tmp_path):
    from sleap_tpu.io.visuals import main as render_main

    labels, _ = _tracked_labels(skel)
    src = str(tmp_path / "p.slp")
    # Predicted-only labels: embed_all_labeled, else no frames are embedded
    # (with_images alone embeds user-labeled frames, reference semantics).
    labels.save(src, with_images=True, embed_all_labeled=True)
    out = str(tmp_path / "rendered.mp4")
    render_main([src, "-o", out, "--frames", "0-2"])
    assert Video.from_filename(out).num_frames >= 2


# --------------------------------------------------------------------------- #
# training.losses
# --------------------------------------------------------------------------- #


def test_ohkm_loss_scales_hard_channels():
    import jax.numpy as jnp

    from sleap_tpu.training.losses import compute_ohkm_loss, mse_loss

    gt = jnp.zeros((2, 8, 8, 4))
    pr = jnp.zeros((2, 8, 8, 4))
    # Channel 3 is "hard" (large error); others are perfect.
    pr = pr.at[..., 3].set(1.0)
    loss = float(
        compute_ohkm_loss(gt, pr, min_hard_keypoints=1, loss_scale=5.0)
    )
    # Hardest channel MSE = 1.0; k = max(n_hard=... , 1). All other channels
    # are 0 loss, so mean over k includes ch3 plus (k-1) zeros.
    assert loss > 0
    # With min_hard_keypoints=2 the mean halves (one zero channel enters).
    loss2 = float(
        compute_ohkm_loss(gt, pr, min_hard_keypoints=2, loss_scale=5.0)
    )
    assert loss2 == pytest.approx(loss / 2.0, rel=1e-5)
    assert float(mse_loss(gt, pr)) == pytest.approx(0.25)


# --------------------------------------------------------------------------- #
# message (ZMQ pair)
# --------------------------------------------------------------------------- #


def test_paired_sender_receiver_roundtrip():
    zmq = pytest.importorskip("zmq")
    from sleap_tpu.message import PairedReceiver, PairedSender

    import os
    address = f"tcp://127.0.0.1:{19000 + os.getpid() % 4000}"
    sender = PairedSender(address)
    receiver = PairedReceiver(address)
    try:
        receiver.setup()
        sender.setup()
        sender.send_dict({"event": "epoch_end", "epoch": 3})
        msgs = receiver.check_messages(timeout=2.0)
        assert any(m.get("event") == "epoch_end" for m in msgs)
    finally:
        sender.close()
        receiver.close()


def test_occupancy_and_points_matrices_with_gaps():
    """Occupancy/points matrices mirror the reference analysis layout
    (reference info/write_tracking_h5.py:59-119): track x frame occupancy,
    per-frame point/score matrices, NaN where a track is absent."""
    import numpy as np

    from sleap_tpu.core.instance import LabeledFrame, PredictedInstance, Track
    from sleap_tpu.core.labels import Labels
    from sleap_tpu.core.skeleton import Skeleton
    from sleap_tpu.info.write_tracking_h5 import get_occupancy_and_points_matrices
    from sleap_tpu.io.video import Video

    sk = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)], name="S")
    video = Video.from_numpy(np.zeros((4, 16, 16, 1), np.uint8))
    t0, t1 = Track(name="t0"), Track(name="t1")

    def pred(x, track, score):
        return PredictedInstance.from_arrays(
            np.array([[x, 0.0], [x, 1.0]]), np.array([0.5, 0.6]), score, sk, track=track
        )

    lfs = [
        LabeledFrame(video=video, frame_idx=0, instances=[pred(1, t0, 0.9), pred(2, t1, 0.8)]),
        # frame 1: t1 missing
        LabeledFrame(video=video, frame_idx=1, instances=[pred(3, t0, 0.7)]),
        LabeledFrame(video=video, frame_idx=3, instances=[pred(4, t1, 0.6)]),
    ]
    labels = Labels(lfs)
    occupancy, points, point_scores, inst_scores, tracking_scores = (
        get_occupancy_and_points_matrices(labels, all_frames=True)
    )
    n_tracks, n_frames = occupancy.shape
    assert (n_tracks, n_frames) == (2, 4)
    np.testing.assert_array_equal(occupancy[0], [1, 1, 0, 0])
    np.testing.assert_array_equal(occupancy[1], [1, 0, 0, 1])
    # points: (frames, nodes, 2, tracks)
    assert points.shape == (4, 2, 2, 2)
    assert points[0, 0, 0, 0] == 1.0
    assert points[3, 0, 0, 1] == 4.0
    assert np.isnan(points[2]).all()  # empty frame
    assert inst_scores.shape == (4, 2)
    assert inst_scores[0, 0] == 0.9 and np.isnan(inst_scores[2, 0])
    assert point_scores.shape == (4, 2, 2)


def test_occupancy_matrices_prefer_user_over_predicted():
    """A user-labeled instance on a track supersedes the prediction on the
    same (frame, track) cell (reference info/write_tracking_h5.py:133-152)."""
    import numpy as np

    from sleap_tpu.core.instance import (
        Instance,
        LabeledFrame,
        PredictedInstance,
        Track,
    )
    from sleap_tpu.core.labels import Labels
    from sleap_tpu.core.skeleton import Skeleton
    from sleap_tpu.info.write_tracking_h5 import get_occupancy_and_points_matrices
    from sleap_tpu.io.video import Video

    sk = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)], name="S")
    video = Video.from_numpy(np.zeros((2, 16, 16, 1), np.uint8))
    t0, t1 = Track(name="t0"), Track(name="t1")

    pred_t0 = PredictedInstance.from_arrays(
        np.array([[10.0, 0.0], [10.0, 1.0]]), np.array([0.5, 0.6]), 0.9, sk, track=t0
    )
    user_t0 = Instance.from_numpy(
        np.array([[99.0, 0.0], [99.0, 1.0]]), sk, track=t0
    )
    pred_t1 = PredictedInstance.from_arrays(
        np.array([[20.0, 0.0], [20.0, 1.0]]), np.array([0.7, 0.8]), 0.8, sk, track=t1
    )
    # Order puts the prediction AFTER the user fix so naive last-write-wins
    # would clobber the correction.
    lf = LabeledFrame(
        video=video, frame_idx=0, instances=[user_t0, pred_t0, pred_t1]
    )
    labels = Labels([lf])
    occupancy, points, point_scores, inst_scores, _ = (
        get_occupancy_and_points_matrices(labels, all_frames=True)
    )
    # Track t0: the user's coordinates win; no scores (user instances have none).
    assert points[0, 0, 0, 0] == 99.0
    assert np.isnan(point_scores[0, :, 0]).all()
    assert np.isnan(inst_scores[0, 0])
    # Track t1 still comes from the prediction.
    assert points[0, 0, 0, 1] == 20.0
    assert inst_scores[0, 1] == 0.8
    np.testing.assert_array_equal(occupancy[:, 0], [1, 1])
