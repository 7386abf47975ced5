"""Evaluation: OKS matching, VOC mAP/mAR, distance/PCK/visibility metrics.

Rebuild of ``/root/reference/sleap/nn/evals.py`` (``compute_oks:134``,
``match_instances:253``, ``compute_generalized_voc_metrics:402``,
``evaluate:618``, ``evaluate_model:683``, ``load_metrics:776``). Pure numpy —
these run on small host-side instance lists, not on the device.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Any, Dict, List, Optional, Text, Tuple, Union

import numpy as np

from sleap_tpu.core.instance import Instance, LabeledFrame, PredictedInstance
from sleap_tpu.core.labels import Labels

logger = logging.getLogger(__name__)


def compute_instance_area(points: np.ndarray) -> np.ndarray:
    """Bounding-box area of each (n_nodes, 2) point set."""
    if points.ndim == 2:
        points = np.expand_dims(points, axis=0)
    min_pt = np.nanmin(points, axis=-2)
    max_pt = np.nanmax(points, axis=-2)
    return np.prod(max_pt - min_pt, axis=-1)


def compute_oks(
    points_gt: np.ndarray,
    points_pr: np.ndarray,
    scale: Optional[float] = None,
    stddev: float = 0.025,
    use_cocoeval: bool = True,
) -> np.ndarray:
    """COCO-style object keypoint similarity, (n_gt, n_pr).

    Implements OKS = mean over visible GT nodes of exp(-d^2 / denom) with the
    cocoeval denominator 2*(area+eps)*(2*sigma)^2 (or the paper's
    2*(area+eps)^2*sigma^2 variant when ``use_cocoeval=False``); semantics
    match ``/root/reference/sleap/nn/evals.py:134`` (the published COCO
    formula) via a masked-mean formulation.
    """
    gt = np.asarray(points_gt, dtype=np.float64)
    pr = np.asarray(points_pr, dtype=np.float64)
    if gt.ndim == 2:
        gt = gt[None]
    if pr.ndim == 2:
        pr = pr[None]

    box_area = compute_instance_area(gt) if scale is None else scale
    area = np.broadcast_to(
        np.asarray(box_area, dtype=np.float64), (gt.shape[0],)
    )
    sigma = np.broadcast_to(np.asarray(stddev, dtype=np.float64), (gt.shape[1],))

    eps = np.finfo(np.float64).eps
    if use_cocoeval:
        # cocoeval convention: vars = (2*sigma)^2, denom = vars * 2*(area+eps)
        denom = (4.0 * sigma**2)[None, None, :] * (2.0 * (area + eps))[:, None, None]
    else:
        # Original OKS paper convention.
        denom = (sigma**2)[None, None, :] * (2.0 * (area + eps) ** 2)[:, None, None]

    # Squared per-node distances over the (gt, pr) cross product.
    sq_dist = np.square(gt[:, None] - pr[None]).sum(axis=-1)  # (n_gt, n_pr, nodes)
    node_sim = np.exp(-sq_dist / denom)

    # A node missing in the prediction contributes zero similarity; a node
    # missing in the GT is excluded from both numerator and denominator.
    visible_gt = ~np.isnan(gt).any(axis=-1)  # (n_gt, nodes)
    visible_pr = ~np.isnan(pr).any(axis=-1)  # (n_pr, nodes)
    node_sim = np.where(visible_pr[None, :, :], node_sim, 0.0)
    node_sim = np.where(visible_gt[:, None, :], node_sim, 0.0)
    return node_sim.sum(axis=-1) / visible_gt.sum(axis=-1, keepdims=True)


def find_frame_pairs(
    labels_gt: Labels, labels_pr: Labels, user_labels_only: bool = True
) -> List[Tuple[LabeledFrame, LabeledFrame]]:
    """Pair up GT/predicted frames by video filename and frame index
    (reference evals.py:61)."""
    pairs = []
    for video_gt in labels_gt.videos:
        video_pr = None
        for v in labels_pr.videos:
            if os.path.basename(str(v.filename)) == os.path.basename(
                str(video_gt.filename)
            ):
                video_pr = v
                break
        if video_pr is None:
            continue
        for lf_gt in labels_gt.find(video_gt):
            if user_labels_only and not lf_gt.has_user_instances:
                continue
            lfs_pr = labels_pr.find(video_pr, frame_idx=lf_gt.frame_idx)
            if lfs_pr:
                pairs.append((lf_gt, lfs_pr[0]))
    return pairs


def match_instances(
    frame_gt: LabeledFrame,
    frame_pr: LabeledFrame,
    stddev: float = 0.025,
    scale: Optional[float] = None,
    threshold: float = 0,
    user_labels_only: bool = True,
) -> Tuple[List[Tuple[Instance, PredictedInstance, float]], List[Instance]]:
    """Greedy best-OKS matching, predictions in descending score order
    (reference evals.py:253)."""
    scores_pr = np.array(
        [
            getattr(inst, "score", np.nan)
            for inst in frame_pr.instances
            if hasattr(inst, "score")
        ]
    )
    idxs_pr = np.argsort(-scores_pr, kind="mergesort")

    available_gt = (
        frame_gt.user_instances if user_labels_only else list(frame_gt.instances)
    )
    available_idxs = list(range(len(available_gt)))

    positive_pairs = []
    for idx_pr in idxs_pr:
        instance_pr = frame_pr.instances[int(idx_pr)]
        if not available_idxs:
            break
        points_pr = np.expand_dims(instance_pr.numpy(), axis=0)
        points_gt = np.stack(
            [available_gt[i].numpy() for i in available_idxs], axis=0
        )
        oks = np.squeeze(
            compute_oks(points_gt, points_pr, stddev=stddev, scale=scale), axis=1
        )
        oks[oks <= threshold] = np.nan
        best = int(np.argsort(-oks, kind="mergesort")[0])
        if np.isnan(oks[best]):
            continue
        gt_idx = available_idxs.pop(best)
        positive_pairs.append((available_gt[gt_idx], instance_pr, oks[best]))

    false_negatives = [available_gt[i] for i in available_idxs]
    return positive_pairs, false_negatives


def match_frame_pairs(
    frame_pairs: List[Tuple[LabeledFrame, LabeledFrame]],
    stddev: float = 0.025,
    scale: Optional[float] = None,
    threshold: float = 0,
    user_labels_only: bool = True,
) -> Tuple[List[Tuple[Instance, PredictedInstance, float]], List[Instance]]:
    positive_pairs, false_negatives = [], []
    for frame_gt, frame_pr in frame_pairs:
        pp, fn = match_instances(
            frame_gt,
            frame_pr,
            stddev=stddev,
            scale=scale,
            threshold=threshold,
            user_labels_only=user_labels_only,
        )
        positive_pairs.extend(pp)
        false_negatives.extend(fn)
    return positive_pairs, false_negatives


def compute_generalized_voc_metrics(
    positive_pairs,
    false_negatives,
    match_scores: np.ndarray,
    match_score_thresholds: np.ndarray = np.linspace(0.5, 0.95, 10),
    recall_thresholds: np.ndarray = np.linspace(0, 1, 101),
    name: str = "voc",
) -> Dict[str, Any]:
    """COCO-style AP/AR with 101-point precision interpolation.

    Semantics follow the published COCOeval accumulation (reference
    ``evals.py:402``), vectorized over all match-score thresholds at once:
    one (T, N) true-positive cumsum, a flip/`maximum.accumulate`/flip
    right-to-left precision envelope, and a broadcast strict-less-than count
    in place of per-threshold ``searchsorted``.
    """
    # Rank detections by confidence (stable sort so ties keep input order),
    # and carry the match quality along.
    confidences = np.asarray([pair[1].score for pair in positive_pairs])
    order = np.argsort(-confidences, kind="mergesort")
    match_scores = np.asarray(match_scores)[order]

    n_det = match_scores.size
    n_positives = len(positive_pairs) + len(false_negatives)
    thresholds = np.asarray(match_score_thresholds, dtype=np.float64)
    eps = np.finfo(np.float64).eps

    # (T, N) cumulative true positives at each detection rank, per threshold.
    is_tp = match_scores[None, :] >= thresholds[:, None]
    tp_cum = np.cumsum(is_tp, axis=1).astype(np.float64)
    rank = np.arange(1, n_det + 1, dtype=np.float64)  # fp+tp at each rank

    recall_curve = tp_cum / n_positives
    precision_curve = tp_cum / (rank[None, :] + eps)
    # Right-to-left running max: precision at recall r is the best precision
    # achievable at any rank with recall >= r (the COCO envelope).
    precision_env = np.flip(
        np.maximum.accumulate(np.flip(precision_curve, axis=1), axis=1), axis=1
    )

    if n_det:
        recalls = recall_curve[:, -1]
        # First rank whose recall reaches each sample point (count of strictly
        # smaller recalls == left-bisection into the nondecreasing curve).
        sample_idx = (
            recall_curve[:, :, None] < recall_thresholds[None, None, :]
        ).sum(axis=1)
        reachable = sample_idx < n_det
        precisions = np.where(
            reachable,
            np.take_along_axis(
                precision_env, np.minimum(sample_idx, n_det - 1), axis=1
            ),
            0.0,
        )
    else:
        recalls = np.zeros(thresholds.shape)
        precisions = np.zeros((thresholds.size, np.asarray(recall_thresholds).size))
    return {
        f"{name}.match_score_thresholds": match_score_thresholds,
        f"{name}.recall_thresholds": recall_thresholds,
        f"{name}.match_scores": match_scores,
        f"{name}.precisions": precisions,
        f"{name}.recalls": recalls,
        f"{name}.AP": precisions.mean(axis=1),
        f"{name}.AR": recalls,
        f"{name}.mAP": precisions.mean(),
        f"{name}.mAR": recalls.mean(),
    }


def compute_dists(positive_pairs) -> Dict[str, Any]:
    dists, frame_idxs, video_paths = [], [], []
    for instance_gt, instance_pr, _ in positive_pairs:
        points_gt = instance_gt.numpy()
        points_pr = instance_pr.numpy()
        dists.append(np.linalg.norm(points_pr - points_gt, axis=-1))
        frame_idxs.append(instance_gt.frame.frame_idx if instance_gt.frame else -1)
        video_paths.append(
            instance_gt.frame.video.filename
            if instance_gt.frame and instance_gt.frame.video
            else ""
        )
    return {
        "dists": np.array(dists),
        "frame_idxs": frame_idxs,
        "video_paths": video_paths,
    }


def compute_dist_metrics(dists_dict: Dict[str, Any]) -> Dict[str, Any]:
    dists = dists_dict["dists"]
    results = {
        "dist.frame_idxs": dists_dict["frame_idxs"],
        "dist.video_paths": dists_dict["video_paths"],
        "dist.dists": dists,
        "dist.avg": np.nanmean(dists) if dists.size else np.nan,
        "dist.p50": np.nan,
        "dist.p75": np.nan,
        "dist.p90": np.nan,
        "dist.p95": np.nan,
        "dist.p99": np.nan,
    }
    non_nan = dists[~np.isnan(dists)] if dists.size else np.array([])
    if non_nan.size:
        for ptile in (50, 75, 90, 95, 99):
            results[f"dist.p{ptile}"] = np.percentile(non_nan, ptile)
    return results


def compute_pck_metrics(
    dists: np.ndarray, thresholds: np.ndarray = np.linspace(1, 10, 10)
) -> Dict[str, Any]:
    dists = np.copy(dists)
    dists[np.isnan(dists)] = np.inf
    pcks = np.expand_dims(dists, -1) < thresholds.reshape(1, 1, -1)
    mPCK_parts = pcks.mean(axis=0).mean(axis=-1)
    return {
        "pck.thresholds": thresholds,
        "pck.pcks": pcks,
        "pck.mPCK_parts": mPCK_parts,
        "pck.mPCK": mPCK_parts.mean(),
    }


def compute_visibility_conf(positive_pairs) -> Dict[str, float]:
    vis_tp = vis_fn = vis_fp = vis_tn = 0
    for instance_gt, instance_pr, _ in positive_pairs:
        missing_gt = np.isnan(instance_gt.numpy()).any(axis=-1)
        missing_pr = np.isnan(instance_pr.numpy()).any(axis=-1)
        vis_tn += (missing_gt & missing_pr).sum()
        vis_fn += (~missing_gt & missing_pr).sum()
        vis_fp += (missing_gt & ~missing_pr).sum()
        vis_tp += (~missing_gt & ~missing_pr).sum()
    return {
        "vis.tp": vis_tp,
        "vis.fp": vis_fp,
        "vis.tn": vis_tn,
        "vis.fn": vis_fn,
        "vis.precision": vis_tp / (vis_tp + vis_fp) if (vis_tp + vis_fp) else np.nan,
        "vis.recall": vis_tp / (vis_tp + vis_fn) if (vis_tp + vis_fn) else np.nan,
    }


def evaluate(
    labels_gt: Labels,
    labels_pr: Labels,
    oks_stddev: float = 0.025,
    oks_scale: Optional[float] = None,
    match_threshold: float = 0,
    user_labels_only: bool = True,
) -> Dict[str, Any]:
    """Full metric suite for a (GT, predicted) label pair (evals.py:618)."""
    metrics: Dict[str, Any] = {}
    frame_pairs = find_frame_pairs(labels_gt, labels_pr, user_labels_only)
    if not frame_pairs:
        return metrics
    positive_pairs, false_negatives = match_frame_pairs(
        frame_pairs,
        stddev=oks_stddev,
        scale=oks_scale,
        threshold=match_threshold,
        user_labels_only=user_labels_only,
    )
    dists_dict = compute_dists(positive_pairs)
    metrics.update(compute_visibility_conf(positive_pairs))
    metrics.update(compute_dist_metrics(dists_dict))
    metrics.update(compute_pck_metrics(dists_dict["dists"]))

    pair_oks = np.array([oks for _, _, oks in positive_pairs])
    pair_pck = metrics["pck.pcks"].mean(axis=-1).mean(axis=-1)
    metrics["oks.mOKS"] = pair_oks.mean() if pair_oks.size else np.nan
    metrics.update(
        compute_generalized_voc_metrics(
            positive_pairs, false_negatives, match_scores=pair_oks, name="oks_voc"
        )
    )
    metrics.update(
        compute_generalized_voc_metrics(
            positive_pairs, false_negatives, match_scores=pair_pck, name="pck_voc"
        )
    )
    return metrics


def evaluate_model(
    cfg,
    labels_gt: Union[Labels, Any],
    model_dir: str,
    save: bool = True,
    split_name: str = "test",
) -> Tuple[Labels, Dict[str, Any]]:
    """Predict on ``labels_gt`` with the model in ``model_dir`` and compute
    metrics; saves ``labels_pr.{split}.slp`` + ``metrics.{split}.npz``
    (reference evals.py:683)."""
    from sleap_tpu.inference.predictors import Predictor

    if not isinstance(labels_gt, Labels):
        labels_gt = labels_gt.labels  # provider

    predictor = Predictor.from_model_paths(model_dir)
    labels_pr = predictor.predict(labels_gt)

    if save:
        labels_pr.save(os.path.join(model_dir, f"labels_pr.{split_name}.slp"))
    metrics = evaluate(labels_gt, labels_pr)
    if save and metrics:
        np.savez_compressed(
            os.path.join(model_dir, f"metrics.{split_name}.npz"), metrics=metrics
        )
    if metrics:
        logger.info("Evaluation (%s): mOKS=%s mAP=%s dist.avg=%s", split_name,
                    metrics.get("oks.mOKS"), metrics.get("oks_voc.mAP"),
                    metrics.get("dist.avg"))
    return labels_pr, metrics


def load_metrics(model_path: str, split: str = "val") -> Dict[str, Any]:
    """Load saved metrics from a model folder (reference evals.py:776).

    Handles both our own npz files and ones written by the reference TF
    implementation (whose pickles reference ``sleap.*`` classes that are not
    installed here — those objects are substituted with structural stubs).
    """
    if os.path.isdir(model_path):
        metrics_path = os.path.join(model_path, f"metrics.{split}.npz")
    else:
        metrics_path = model_path
    try:
        with np.load(metrics_path, allow_pickle=True) as data:
            return data["metrics"].item()
    except ModuleNotFoundError:
        return _load_foreign_metrics(metrics_path)


class _ForeignUnpickler(pickle.Unpickler):
    """Unpickles reference-written metrics without the ``sleap`` package.

    Array subclasses (PointArray etc.) decode as plain ndarray subclasses;
    other sleap objects become attribute-bag stubs. Numeric metric values
    are unaffected.
    """

    _cache: Dict[Any, type] = {}

    def find_class(self, module, name):
        if module.split(".")[0] == "sleap":
            key = (module, name)
            if key not in self._cache:
                if "Array" in name:
                    self._cache[key] = type(name, (np.ndarray,), {})
                else:

                    def _setstate(self, state):
                        if isinstance(state, dict):
                            self.__dict__.update(state)
                        elif (
                            isinstance(state, tuple)
                            and len(state) == 2
                            and isinstance(state[0], (dict, type(None)))
                        ):
                            if state[0]:
                                self.__dict__.update(state[0])
                            if isinstance(state[1], dict):
                                self.__dict__.update(state[1])
                        else:
                            self.__dict__["_state"] = state

                    self._cache[key] = type(
                        name,
                        (),
                        {
                            "__setstate__": _setstate,
                            "__init__": lambda self, *a, **k: None,
                            "__new__": lambda cls, *a, **k: object.__new__(cls),
                        },
                    )
            return self._cache[key]
        return super().find_class(module, name)


def _load_foreign_metrics(metrics_path: str) -> Dict[str, Any]:
    import zipfile

    from numpy.lib import format as npformat

    with zipfile.ZipFile(metrics_path) as zf:
        with zf.open("metrics.npy") as f:
            version = npformat.read_magic(f)
            npformat._read_array_header(f, version)
            arr = _ForeignUnpickler(f).load()
    return arr.item() if hasattr(arr, "item") else arr
