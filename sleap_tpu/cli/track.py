"""``sleap-track``: run inference (and optionally tracking) on videos/labels.

Rebuild of the reference CLI (``/root/reference/sleap/nn/inference.py:5117``
parser, ``main:5555``) with the same flag surface.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import List, Optional

logger = logging.getLogger(__name__)


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Run sleap-tpu inference.")
    parser.add_argument(
        "data_path", nargs="?", default="",
        help="Video file, labels (.slp), image dir, or list file to predict on.",
    )
    parser.add_argument(
        "-m", "--model", action="append", dest="models", default=None,
        help="Model run folder (repeatable for top-down pairs).",
    )
    parser.add_argument("--frames", default="", help="e.g. 1-100 or 2,4,6")
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--no-empty-frames", action="store_true")
    parser.add_argument("--verbosity", choices=("none", "rich", "json"), default="rich")
    parser.add_argument("--video.dataset", dest="video_dataset", default=None)
    parser.add_argument("--video.input_format", dest="video_input_format", default="channels_last")
    parser.add_argument("--video.index", dest="video_index", default="")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument(
        "--n-devices", type=int, default=None, dest="n_devices",
        help="Data-parallel inference over this many devices: each takes a "
        "batch slice; per-device batch stays at --batch_size.",
    )
    parser.add_argument("--peak_threshold", type=float, default=0.2)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--max_instances", "-n", type=int, default=None)
    parser.add_argument("--max_edge_length_ratio", type=float, default=0.25)
    parser.add_argument("--dist_penalty_weight", type=float, default=1.0)
    parser.add_argument("--only-labeled-frames", action="store_true")
    parser.add_argument("--only-suggested-frames", action="store_true")
    # Tracking options (reference auto-generates these from tracker signatures).
    parser.add_argument("--tracking.tracker", dest="tracking_tracker", default=None)
    parser.add_argument("--tracking.max_tracking", dest="tracking_max_tracking", default=None)
    parser.add_argument("--tracking.max_tracks", dest="tracking_max_tracks", type=int, default=None)
    parser.add_argument("--tracking.target_instance_count", dest="tracking_target_instance_count", type=int, default=0)
    parser.add_argument("--tracking.post_connect_single_breaks", dest="tracking_post_connect_single_breaks", type=int, default=0)
    parser.add_argument("--tracking.clean_instance_count", dest="tracking_clean_instance_count", type=int, default=0)
    parser.add_argument("--tracking.similarity", dest="tracking_similarity", default="instance")
    parser.add_argument("--tracking.match", dest="tracking_match", default="greedy")
    parser.add_argument("--tracking.track_window", dest="tracking_track_window", type=int, default=5)
    parser.add_argument("--tracking.min_new_track_points", dest="tracking_min_new_track_points", type=int, default=0)
    parser.add_argument("--tracking.min_match_points", dest="tracking_min_match_points", type=int, default=0)
    parser.add_argument("--tracking.img_scale", dest="tracking_img_scale", type=float, default=1.0)
    parser.add_argument("--tracking.of_window_size", dest="tracking_of_window_size", type=int, default=21)
    parser.add_argument("--tracking.of_max_levels", dest="tracking_of_max_levels", type=int, default=3)
    # Full reference auto-generated surface (inference.py:5539): robust
    # quantile, pre-cull, cleaning IoU, shifted-instance saving, OKS options,
    # and Kalman-filter init (reference exposes kf via tracking.kf_*).
    parser.add_argument("--tracking.robust", dest="tracking_robust", type=float, default=1.0,
                        help="Robust quantile of similarity scores (1.0 = max).")
    parser.add_argument("--tracking.save_shifted_instances", dest="tracking_save_shifted_instances", type=int, default=0)
    parser.add_argument("--tracking.pre_cull_to_target", dest="tracking_pre_cull_to_target", type=int, default=0)
    parser.add_argument("--tracking.pre_cull_iou_threshold", dest="tracking_pre_cull_iou_threshold", type=float, default=None)
    parser.add_argument("--tracking.clean_iou_threshold", dest="tracking_clean_iou_threshold", type=float, default=None)
    parser.add_argument("--tracking.oks_errors", dest="tracking_oks_errors", default=None,
                        help="Comma-separated per-node errors for object_keypoint similarity.")
    parser.add_argument("--tracking.oks_score_weighting", dest="tracking_oks_score_weighting", type=int, default=0)
    parser.add_argument("--tracking.oks_normalization", dest="tracking_oks_normalization", default="all")
    parser.add_argument("--tracking.kf_init_frame_count", dest="tracking_kf_init_frame_count", type=int, default=0,
                        help="If >0, run Kalman filters initialized from this many tracked frames.")
    parser.add_argument("--tracking.kf_node_indices", dest="tracking_kf_node_indices", default=None,
                        help="Comma-separated node indices to use for Kalman filtering.")
    return parser


def parse_frames(frames: str) -> Optional[List[int]]:
    if not frames:
        return None
    out: List[int] = []
    for part in frames.split(","):
        part = part.strip()
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        elif part:
            out.append(int(part))
    return out


def make_provider_from_cli(ns):
    """Path sniffing -> provider (reference inference.py:5347)."""
    from sleap_tpu.core.labels import Labels
    from sleap_tpu.data.providers import LabelsReader, VideoReader
    from sleap_tpu.io.video import Video

    path = ns.data_path
    frames = parse_frames(ns.frames)
    if path.endswith(".slp"):
        labels = Labels.load_file(path)
        if ns.only_labeled_frames:
            inds = [
                i for i, lf in enumerate(labels.labeled_frames) if lf.has_user_instances
            ]
            return LabelsReader(labels=labels, example_indices=inds), labels
        if ns.only_suggested_frames:
            return LabelsReader.from_unlabeled_suggestions(labels), labels
        if frames is not None and labels.video is not None:
            return VideoReader(video=labels.video, example_indices=frames), labels
        return LabelsReader(labels=labels), labels
    if os.path.isdir(path):
        import glob

        images = sorted(
            sum((glob.glob(os.path.join(path, f"*.{ext}")) for ext in ("png", "jpg", "jpeg")), [])
        )
        video = Video.from_image_filenames(images)
        return VideoReader(video=video, example_indices=frames), None
    if path.endswith((".csv", ".txt")):
        with open(path) as f:
            paths = [line.strip() for line in f if line.strip()]
        # Return the first; multi-file prediction loops in main().
        return [
            (VideoReader.from_filepath(p, example_indices=frames), None) for p in paths
        ], None
    kwargs = {}
    if ns.video_dataset:
        kwargs["dataset"] = ns.video_dataset
    video = Video.from_filename(path, **kwargs)
    return VideoReader(video=video, example_indices=frames), None


def make_predictor_from_cli(ns):
    from sleap_tpu.inference.predictors import Predictor

    if not ns.models:
        raise SystemExit("At least one model (-m) is required.")
    return Predictor.from_model_paths(
        ns.models,
        peak_threshold=ns.peak_threshold,
        batch_size=ns.batch_size,
        max_instances=ns.max_instances,
        verbosity=ns.verbosity,
    )


def make_tracker_from_cli(ns):
    if ns.tracking_tracker is None:
        return None
    from sleap_tpu.tracking.tracker import Tracker

    return Tracker.make_tracker_by_name(
        tracker=ns.tracking_tracker,
        similarity=ns.tracking_similarity,
        match=ns.tracking_match,
        track_window=ns.tracking_track_window,
        max_tracks=ns.tracking_max_tracks,
        max_tracking=bool(ns.tracking_max_tracking),
        min_new_track_points=ns.tracking_min_new_track_points,
        min_match_points=ns.tracking_min_match_points,
        img_scale=ns.tracking_img_scale,
        of_window_size=ns.tracking_of_window_size,
        of_max_levels=ns.tracking_of_max_levels,
        target_instance_count=ns.tracking_target_instance_count,
        post_connect_single_breaks=bool(ns.tracking_post_connect_single_breaks),
        clean_instance_count=ns.tracking_clean_instance_count,
        robust=ns.tracking_robust,
        save_shifted_instances=bool(ns.tracking_save_shifted_instances),
        pre_cull_to_target=bool(ns.tracking_pre_cull_to_target),
        pre_cull_iou_threshold=ns.tracking_pre_cull_iou_threshold,
        clean_iou_threshold=ns.tracking_clean_iou_threshold,
        oks_errors=(
            [float(v) for v in ns.tracking_oks_errors.split(",")]
            if ns.tracking_oks_errors
            else None
        ),
        oks_score_weighting=bool(ns.tracking_oks_score_weighting),
        oks_normalization=ns.tracking_oks_normalization,
        kf_init_frame_count=ns.tracking_kf_init_frame_count,
        kf_node_indices=(
            [int(v) for v in ns.tracking_kf_node_indices.split(",")]
            if ns.tracking_kf_node_indices
            else None
        ),
    )


def main(args: Optional[List[str]] = None) -> None:
    logging.basicConfig(level=logging.INFO)
    ns = make_parser().parse_args(args)
    if ns.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    provider, _ = make_provider_from_cli(ns)
    predictor = make_predictor_from_cli(ns)
    if ns.n_devices and ns.n_devices > 1:
        from sleap_tpu.parallel.distributed import make_sharded_predictor
        from sleap_tpu.parallel.mesh import make_mesh

        predictor = make_sharded_predictor(
            predictor, make_mesh(n_devices=ns.n_devices)
        )
    predictor.tracker = make_tracker_from_cli(ns)

    labels_pr = predictor.predict(provider)
    if ns.no_empty_frames:
        labels_pr.remove_empty_frames()

    output = ns.output
    if output is None:
        base = ns.data_path or "predictions"
        output = base + ".predictions.slp"
    labels_pr.provenance.update(
        {
            "model_paths": ns.models,
            "data_path": ns.data_path,
            "output_path": output,
        }
    )
    labels_pr.save(output)
    if ns.verbosity != "none":
        print(f"\nSaved {len(labels_pr)} frames to {output}")


if __name__ == "__main__":
    main()
