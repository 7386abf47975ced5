import numpy as np
import pytest

from sleap_tpu.core.instance import Instance, LabeledFrame, PredictedInstance
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.evals import (
    compute_dist_metrics,
    compute_dists,
    compute_generalized_voc_metrics,
    compute_instance_area,
    compute_oks,
    compute_pck_metrics,
    compute_visibility_conf,
    evaluate,
    match_instances,
)
from sleap_tpu.io.video import Video


def test_compute_oks_perfect_match():
    pts = np.array([[0.0, 0.0], [10.0, 10.0]])
    oks = compute_oks(pts, pts)
    assert oks.shape == (1, 1)
    assert oks[0, 0] == pytest.approx(1.0)


def test_compute_oks_missing_gt_ignored():
    gt = np.array([[0.0, 0.0], [np.nan, np.nan]])
    pr = np.array([[0.0, 0.0], [10.0, 10.0]])
    oks = compute_oks(gt, pr, scale=100.0)
    assert oks[0, 0] == pytest.approx(1.0)  # only visible GT nodes count


def test_compute_oks_missing_pred_penalized():
    gt = np.array([[0.0, 0.0], [10.0, 10.0]])
    pr = np.array([[0.0, 0.0], [np.nan, np.nan]])
    oks = compute_oks(gt, pr, scale=100.0)
    assert oks[0, 0] == pytest.approx(0.5)


def test_instance_area():
    pts = np.array([[0.0, 0.0], [4.0, 5.0]])
    assert compute_instance_area(pts)[0] == pytest.approx(20.0)


def _make_pair(gt_pts_list, pr_pts_list, pr_scores):
    skel = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)])
    video = Video.from_numpy(np.zeros((1, 64, 64, 1), "uint8"))
    lf_gt = LabeledFrame(
        video=video, frame_idx=0,
        instances=[Instance(skeleton=skel, points=np.asarray(p)) for p in gt_pts_list],
    )
    lf_pr = LabeledFrame(
        video=video, frame_idx=0,
        instances=[
            PredictedInstance.from_arrays(np.asarray(p), np.ones(2), s, skel)
            for p, s in zip(pr_pts_list, pr_scores)
        ],
    )
    return lf_gt, lf_pr, video


def test_match_instances_greedy_by_score():
    gt_a = [[0.0, 0.0], [10.0, 10.0]]
    gt_b = [[30.0, 30.0], [40.0, 40.0]]
    lf_gt, lf_pr, _ = _make_pair(
        [gt_a, gt_b],
        [gt_b, gt_a],  # predictions in reverse order
        [0.9, 0.8],
    )
    pairs, fns = match_instances(lf_gt, lf_pr)
    assert len(pairs) == 2 and not fns
    for inst_gt, inst_pr, oks in pairs:
        np.testing.assert_allclose(inst_gt.numpy(), inst_pr.numpy())
        assert oks == pytest.approx(1.0)


def test_evaluate_end_to_end():
    gt_a = [[0.0, 0.0], [10.0, 10.0]]
    gt_b = [[30.0, 30.0], [42.0, 40.0]]
    lf_gt, lf_pr, video = _make_pair([gt_a, gt_b], [gt_a, gt_b], [0.9, 0.8])
    labels_gt = Labels([lf_gt])
    labels_pr = Labels([lf_pr])
    metrics = evaluate(labels_gt, labels_pr)
    assert metrics["oks.mOKS"] == pytest.approx(1.0)
    assert metrics["oks_voc.mAP"] > 0.99
    assert metrics["dist.avg"] == pytest.approx(0.0)
    assert metrics["pck.mPCK"] == pytest.approx(1.0)
    assert metrics["vis.precision"] == pytest.approx(1.0)


def test_evaluate_with_false_negative():
    gt_a = [[0.0, 0.0], [10.0, 10.0]]
    gt_b = [[30.0, 30.0], [42.0, 40.0]]
    lf_gt, lf_pr, video = _make_pair([gt_a, gt_b], [gt_a], [0.9])
    metrics = evaluate(Labels([lf_gt]), Labels([lf_pr]))
    # One of two GT instances missed: recall capped at 0.5.
    assert metrics["oks_voc.mAR"] == pytest.approx(0.5)


def test_metrics_npz_roundtrip(tmp_path):
    import numpy as np
    from sleap_tpu.evals import load_metrics

    metrics = {"oks.mOKS": 0.9, "dist.avg": 1.5}
    np.savez_compressed(str(tmp_path / "metrics.val.npz"), metrics=metrics)
    loaded = load_metrics(str(tmp_path), split="val")
    assert loaded["oks.mOKS"] == 0.9


@pytest.fixture
def skeleton():
    sk = Skeleton("eval")
    sk.add_nodes(["a", "b"])
    return sk


def _pair(skeleton, gt_pts, pr_pts):
    gt = Instance(skeleton=skeleton, points=np.asarray(gt_pts, "f8"))
    pr = PredictedInstance.from_arrays(
        np.asarray(pr_pts, "f8"), np.ones(len(pr_pts)), 0.9, skeleton
    )
    return (gt, pr, 1.0)


def test_compute_dists_and_metrics(skeleton):
    pairs = [
        _pair(skeleton, [[0, 0], [10, 10]], [[3, 4], [10, 10]]),  # dists 5, 0
        _pair(skeleton, [[0, 0], [0, 0]], [[0, 1], [0, 2]]),      # dists 1, 2
    ]
    dd = compute_dists(pairs)
    np.testing.assert_allclose(dd["dists"], [[5, 0], [1, 2]])
    m = compute_dist_metrics(dd)
    assert m["dist.avg"] == pytest.approx(2.0)
    assert m["dist.p50"] == pytest.approx(np.percentile([5, 0, 1, 2], 50))
    assert m["dist.p99"] <= 5.0


def test_compute_pck_metrics():
    dists = np.array([[0.5, 3.0], [np.nan, 20.0]])
    m = compute_pck_metrics(dists, thresholds=np.array([1.0, 5.0]))
    # Node 0: 0.5 hits both thresholds, NaN hits none -> mean over
    # (instances, thresholds) = (1+1+0+0)/4.
    assert m["pck.mPCK_parts"][0] == pytest.approx(0.5)
    # Node 1: 3.0 hits only t=5, 20 hits none -> 1/4.
    assert m["pck.mPCK_parts"][1] == pytest.approx(0.25)
    assert m["pck.mPCK"] == pytest.approx(0.375)


def test_compute_visibility_conf(skeleton):
    pairs = [
        _pair(
            skeleton,
            [[0, 0], [np.nan, np.nan]],
            [[0, 0], [np.nan, np.nan]],
        ),  # tp, tn
        _pair(
            skeleton,
            [[0, 0], [np.nan, np.nan]],
            [[np.nan, np.nan], [1, 1]],
        ),  # fn, fp
    ]
    v = compute_visibility_conf(pairs)
    assert v["vis.tp"] == 1 and v["vis.tn"] == 1
    assert v["vis.fp"] == 1 and v["vis.fn"] == 1
    assert v["vis.precision"] == pytest.approx(0.5)
    assert v["vis.recall"] == pytest.approx(0.5)


def test_voc_metrics_perfect_predictions(skeleton):
    pairs = [
        _pair(skeleton, [[0, 0], [10, 10]], [[0, 0], [10, 10]]) for _ in range(4)
    ]
    # Rebuild pair OKS properly: matched pairs carry their OKS score.
    scored = []
    for gt, pr, _ in pairs:
        oks = compute_oks(gt.numpy()[None], pr.numpy()[None])[0, 0]
        scored.append((gt, pr, float(oks)))
    voc = compute_generalized_voc_metrics(
        scored, [], match_scores=[p[2] for p in scored]
    )
    assert voc["voc.mAP"] == pytest.approx(1.0)
    assert voc["voc.mAR"] == pytest.approx(1.0)
