"""End-to-end CLI tests (reference tests/nn/test_inference.py:1546-1961 runs
sleap-track main against temp dirs; test_training.py runs sleap-train)."""

import json
import os

import numpy as np
import pytest

MODELS = "/root/reference/tests/data/models"


def _require(path):
    if not os.path.exists(path):
        pytest.skip(f"reference fixture unavailable: {path}")
    return path


@pytest.mark.slow
def test_sleap_track_cli_topdown_e2e(tmp_path):
    centroid = _require(os.path.join(MODELS, "minimal_instance.UNet.centroid"))
    instance = _require(os.path.join(MODELS, "minimal_instance.UNet.centered_instance"))
    data = _require(os.path.join(centroid, "labels_gt.val.slp"))
    out = str(tmp_path / "preds.slp")

    from sleap_tpu.cli.track import main

    main(
        [
            data,
            "-m", centroid,
            "-m", instance,
            "-o", out,
            "--verbosity", "none",
            "--max_instances", "4",
        ]
    )
    import sleap_tpu

    labels = sleap_tpu.load_file(out)
    assert len(labels) >= 1
    assert all(len(lf.predicted_instances) == 2 for lf in labels.labeled_frames)
    assert labels.provenance["model_paths"] == [centroid, instance]


@pytest.mark.slow
def test_sleap_track_cli_with_tracking(tmp_path):
    """Bottom-up model + simple tracker over a few video frames."""
    model = _require(os.path.join(MODELS, "minimal_instance.UNet.bottomup"))
    video = _require("/root/reference/tests/data/videos/centered_pair_small.mp4")
    out = str(tmp_path / "tracked.slp")

    from sleap_tpu.cli.track import main

    main(
        [
            video,
            "-m", model,
            "-o", out,
            "--frames", "0-3",
            "--verbosity", "none",
            "--tracking.tracker", "simple",
            "--tracking.similarity", "instance",
            "--tracking.match", "greedy",
        ]
    )
    import sleap_tpu

    labels = sleap_tpu.load_file(out)
    assert len(labels) == 4
    tracked = [
        inst
        for lf in labels.labeled_frames
        for inst in lf.predicted_instances
        if inst.track is not None
    ]
    assert len(tracked) > 0


@pytest.mark.slow
def test_sleap_track_cli_full_tracking_surface(tmp_path):
    """Exercise the auto-generated-style flag surface (reference
    inference.py:5539): robust quantile, pre-cull, clean IoU, OKS options,
    and Kalman-filter flags all reach the tracker factory."""
    model = _require(os.path.join(MODELS, "minimal_instance.UNet.bottomup"))
    video = _require("/root/reference/tests/data/videos/centered_pair_small.mp4")
    out = str(tmp_path / "tracked_full.slp")

    from sleap_tpu.cli.track import main

    main(
        [
            video,
            "-m", model,
            "-o", out,
            "--frames", "0-3",
            "--verbosity", "none",
            "--tracking.tracker", "simple",
            "--tracking.similarity", "object_keypoint",
            "--tracking.oks_errors", "1.0,1.0",
            "--tracking.oks_score_weighting", "1",
            "--tracking.match", "greedy",
            "--tracking.robust", "0.95",
            "--tracking.target_instance_count", "2",
            "--tracking.pre_cull_to_target", "1",
            "--tracking.pre_cull_iou_threshold", "0.8",
            "--tracking.clean_instance_count", "2",
            "--tracking.clean_iou_threshold", "0.8",
        ]
    )
    import sleap_tpu

    labels = sleap_tpu.load_file(out)
    assert len(labels) == 4


def test_sleap_track_cli_kf_flags_build_kalman_tracker():
    """kf flags on sleap-track produce a KalmanTracker wrapper."""
    from sleap_tpu.cli.track import make_parser, make_tracker_from_cli
    from sleap_tpu.tracking.kalman import KalmanTracker

    ns = make_parser().parse_args(
        [
            "x.mp4",
            "-m", "m",
            "--tracking.tracker", "flow",
            "--tracking.kf_init_frame_count", "3",
            "--tracking.kf_node_indices", "0,1",
            "--tracking.target_instance_count", "2",
        ]
    )
    tracker = make_tracker_from_cli(ns)
    assert isinstance(tracker, KalmanTracker)


@pytest.mark.slow
def test_sleap_train_cli_e2e(tmp_path):
    """sleap-train on a profile JSON + labels path produces a run folder."""
    import sleap_tpu
    from sleap_tpu.core.instance import Instance, LabeledFrame
    from sleap_tpu.core.labels import Labels
    from sleap_tpu.core.skeleton import Skeleton
    from sleap_tpu.io.video import Video

    rng = np.random.default_rng(0)
    skel = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)], name="S")
    video = Video.from_numpy(rng.integers(0, 255, (4, 32, 32, 1), np.uint8))
    lfs = [
        LabeledFrame(
            video=video, frame_idx=i,
            instances=[Instance(skeleton=skel, points=rng.uniform(8, 24, (2, 2)))],
        )
        for i in range(4)
    ]
    labels_path = str(tmp_path / "train.pkg.slp")
    Labels(lfs).save(labels_path, with_images=True)

    cfg = {
        "data": {
            "labels": {"validation_fraction": 0.25},
            "preprocessing": {"pad_to_stride": 4},
        },
        "model": {
            "backbone": {
                "unet": {
                    "max_stride": 4, "output_stride": 2,
                    "filters": 4, "filters_rate": 1.5,
                }
            },
            "heads": {
                "single_instance": {"output_stride": 2, "sigma": 3.0}
            },
        },
        "optimization": {
            "epochs": 1, "batch_size": 2, "batches_per_epoch": 2,
            "val_batches_per_epoch": 1,
        },
        "outputs": {
            "runs_folder": str(tmp_path / "runs"),
            "run_name": "cli_e2e",
            "save_visualizations": False,
        },
    }
    cfg_path = str(tmp_path / "profile.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    from sleap_tpu.cli.train import main

    main([cfg_path, labels_path])
    run = tmp_path / "runs" / "cli_e2e"
    assert (run / "best_model.ckpt").is_dir()
    assert (run / "training_config.json").exists()
    assert (run / "training_log.csv").exists()
    assert (run / "labels_pr.val.slp").exists()
