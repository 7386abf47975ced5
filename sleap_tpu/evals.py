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
    """COCO-style object keypoint similarity, (n_gt, n_pr)."""
    if points_gt.ndim == 2:
        points_gt = np.expand_dims(points_gt, axis=0)
    if points_pr.ndim == 2:
        points_pr = np.expand_dims(points_pr, axis=0)
    if scale is None:
        scale = compute_instance_area(points_gt)

    n_gt, n_nodes, n_ed = points_gt.shape
    n_pr = points_pr.shape[0]
    if np.isscalar(scale):
        scale = np.full(n_gt, scale)
    if np.isscalar(stddev):
        stddev = np.full(n_nodes, stddev)

    displacement = points_gt.reshape(n_gt, 1, n_nodes, n_ed) - points_pr.reshape(
        1, n_pr, n_nodes, n_ed
    )
    distance = (displacement**2).sum(axis=-1)  # (n_gt, n_pr, n_nodes)

    if use_cocoeval:
        spread_factor = (2 * stddev) ** 2
        scale_factor = 2 * (scale + np.spacing(1))
    else:
        spread_factor = stddev**2
        scale_factor = 2 * ((scale + np.spacing(1)) ** 2)
    normalization = spread_factor.reshape(1, 1, n_nodes) * scale_factor.reshape(
        n_gt, 1, 1
    )

    missing_pr = np.any(np.isnan(points_pr), axis=-1)
    distance[:, missing_pr] = np.inf
    ks = np.exp(-(distance / normalization))
    missing_gt = np.any(np.isnan(points_gt), axis=-1)
    ks[np.expand_dims(missing_gt, axis=1)] = 0
    n_visible_gt = np.sum((~missing_gt).astype("float64"), axis=-1, keepdims=True)
    return np.sum(ks, axis=-1) / n_visible_gt


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
    """COCO-style AP/AR with 101-point precision interpolation
    (reference evals.py:402)."""
    detection_scores = np.array([pp[1].score for pp in positive_pairs])
    inds = np.argsort(-detection_scores, kind="mergesort")
    detection_scores = detection_scores[inds]
    match_scores = np.asarray(match_scores)[inds]

    precisions, recalls = [], []
    npig = len(positive_pairs) + len(false_negatives)
    for thresh in match_score_thresholds:
        tp = np.cumsum(match_scores >= thresh)
        fp = np.cumsum(match_scores < thresh)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        recall = rc[-1] if len(rc) else 0.0
        for i in range(len(pr) - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        rc_inds = np.searchsorted(rc, recall_thresholds, side="left")
        precision = np.zeros(rc_inds.shape)
        valid = rc_inds < len(pr)
        precision[valid] = pr[rc_inds[valid]]
        precisions.append(precision)
        recalls.append(recall)

    precisions = np.array(precisions)
    recalls = np.array(recalls)
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
