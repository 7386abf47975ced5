"""Tracker component functions: similarities, matching, NMS/culling, track
break repair (reference sleap/nn/tracker/components.py + its tests)."""

import numpy as np
import pytest

from sleap_tpu.core.instance import Instance, LabeledFrame, PredictedInstance, Track
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.tracking.components import (
    FrameMatches,
    centroid_distance,
    compute_iou,
    connect_single_track_breaks,
    cull_instances,
    factory_object_keypoint_similarity,
    first_choice_matching,
    greedy_matching,
    hungarian_matching,
    instance_iou,
    instance_similarity,
    nms_fast,
    nms_instances,
    normalized_instance_similarity,
)


@pytest.fixture
def skeleton():
    sk = Skeleton("t")
    sk.add_nodes(["a", "b"])
    return sk


def _inst(skeleton, pts, score=None, track=None):
    if score is None:
        return Instance(skeleton=skeleton, points=np.asarray(pts, "f8"), track=track)
    return PredictedInstance.from_arrays(
        np.asarray(pts, "f8"), np.ones(len(pts)), score, skeleton, track=track
    )


def test_instance_similarity(skeleton):
    a = _inst(skeleton, [[0, 0], [1, 1]])
    b = _inst(skeleton, [[0, 0], [1, 1]])
    assert instance_similarity(a, b) == pytest.approx(1.0)
    c = _inst(skeleton, [[10, 10], [11, 11]])
    assert instance_similarity(a, c) < 1e-8
    # Partially visible query: exp(-d2) averaged over ref-visible points.
    d = _inst(skeleton, [[0, 0], [np.nan, np.nan]])
    assert 0.0 < instance_similarity(a, d) <= 0.5 + 1e-9


def test_normalized_similarity_scales_by_image(skeleton):
    a = _inst(skeleton, [[0, 0], [10, 10]])
    b = _inst(skeleton, [[2, 2], [12, 12]])
    raw = instance_similarity(a, b)
    norm = normalized_instance_similarity(a, b, img_hw=(100, 100))
    assert norm > raw  # distances shrink when normalized by image size


def test_centroid_distance_and_iou(skeleton):
    a = _inst(skeleton, [[0, 0], [2, 2]])
    b = _inst(skeleton, [[2, 0], [4, 2]])
    # centroid_distance is a SIMILARITY: negative euclidean distance.
    assert centroid_distance(a, b) == pytest.approx(-2.0)
    c = _inst(skeleton, [[1, 1], [3, 3]])
    assert 0 < instance_iou(a, c) < 1
    assert instance_iou(a, a) == pytest.approx(1.0)
    assert compute_iou(np.array([0, 0, 2, 2]), np.array([0, 0, 2, 2])) == pytest.approx(1.0)
    assert compute_iou(np.array([0, 0, 1, 1]), np.array([5, 5, 6, 6])) == 0.0


def test_object_keypoint_similarity_factory(skeleton):
    sim = factory_object_keypoint_similarity(
        keypoint_errors=[1.0, 1.0], score_weighting=False
    )
    a = _inst(skeleton, [[0, 0], [5, 5]], score=1.0)
    b = _inst(skeleton, [[0, 0], [5, 5]], score=1.0)
    assert sim(a, b) == pytest.approx(1.0, abs=1e-6)
    c = _inst(skeleton, [[3, 0], [8, 5]], score=1.0)
    assert 0 < sim(a, c) < 1


def test_matching_functions():
    cost = np.array([[1.0, 10.0], [10.0, 1.0]])
    assert sorted(hungarian_matching(cost)) == [(0, 0), (1, 1)]
    assert sorted(greedy_matching(cost)) == [(0, 0), (1, 1)]
    assert sorted(first_choice_matching(cost)) == [(0, 0), (1, 1)]
    # Greedy picks the global min first even when hungarian would differ:
    # greedy takes (0,0)+(1,1)=101, hungarian the optimal (0,1)+(1,0)=4.
    cost2 = np.array([[1.0, 2.0], [2.0, 100.0]])
    assert sorted(hungarian_matching(cost2)) == [(0, 1), (1, 0)]
    assert sorted(greedy_matching(cost2)) == [(0, 0), (1, 1)]


def test_frame_matches_robust_quantile(skeleton):
    ref = [_inst(skeleton, [[0, 0], [1, 1]])]
    query = [
        _inst(skeleton, [[0, 0], [1, 1]], score=0.9),
        _inst(skeleton, [[50, 50], [51, 51]], score=0.8),
    ]
    fm = FrameMatches.from_candidate_instances(
        untracked_instances=query,
        candidate_instances=ref,
        similarity_function=instance_similarity,
        matching_function=hungarian_matching,
    )
    assert len(fm.matches) >= 1
    best = fm.matches[0]
    assert best.instance is query[0]


def test_nms_fast_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], "f8")
    scores = np.array([0.9, 0.8, 0.5])
    suppressed = nms_fast(boxes, scores, iou_threshold=0.5)
    assert suppressed == [1]


def test_nms_instances_respects_target_count(skeleton):
    insts = [
        _inst(skeleton, [[0, 0], [10, 10]], score=0.9),
        _inst(skeleton, [[1, 1], [11, 11]], score=0.8),  # overlaps first
        _inst(skeleton, [[50, 50], [60, 60]], score=0.5),
    ]
    kept, removed = nms_instances(insts, iou_threshold=0.5)
    assert len(kept) == 2 and removed[0] is insts[1]
    # target_count keeps the overlapping one when needed.
    kept2, removed2 = nms_instances(insts, iou_threshold=0.5, target_count=3)
    assert len(kept2) == 3 and not removed2


def test_cull_instances(skeleton):
    video = None
    frames = []
    for fi in range(2):
        insts = [
            _inst(skeleton, [[0, 0], [5, 5]], score=0.9),
            _inst(skeleton, [[20, 20], [25, 25]], score=0.7),
            _inst(skeleton, [[40, 40], [45, 45]], score=0.3),
        ]
        frames.append(LabeledFrame(video=video, frame_idx=fi, instances=insts))
    cull_instances(frames, instance_count=2)
    for lf in frames:
        assert len(lf.instances) == 2
        assert all(inst.score >= 0.7 for inst in lf.instances)


def test_connect_single_track_breaks(skeleton):
    t1, t2, t3 = Track(name="t1"), Track(name="t2"), Track(name="t3")
    frames = [
        LabeledFrame(
            video=None, frame_idx=0,
            instances=[
                _inst(skeleton, [[0, 0], [1, 1]], track=t1),
                _inst(skeleton, [[5, 5], [6, 6]], track=t2),
            ],
        ),
        # t2 disappears...
        LabeledFrame(
            video=None, frame_idx=1,
            instances=[_inst(skeleton, [[0, 0], [1, 1]], track=t1)],
        ),
        # ...and a brand-new track appears: should be merged back into t2.
        LabeledFrame(
            video=None, frame_idx=2,
            instances=[
                _inst(skeleton, [[0, 0], [1, 1]], track=t1),
                _inst(skeleton, [[5, 5], [6, 6]], track=t3),
            ],
        ),
    ]
    connect_single_track_breaks(frames, instance_count=2)
    tracks_f2 = {inst.track for inst in frames[2].instances}
    assert tracks_f2 == {t1, t2}


# --------------------------------------------------------------------------- #
# Vectorized batch similarity paths match the scalar functions bit-for-bit
# --------------------------------------------------------------------------- #


def _random_instances(skeleton, n, rng, nan_prob=0.25, predicted=True, tracks=None):
    out = []
    for k in range(n):
        pts = rng.uniform(0, 50, (len(skeleton.nodes), 2))
        mask = rng.uniform(size=len(pts)) < nan_prob
        pts[mask] = np.nan
        track = None if tracks is None else tracks[k % len(tracks)]
        if predicted:
            out.append(
                PredictedInstance.from_arrays(
                    pts,
                    rng.uniform(0.1, 1.0, len(pts)),
                    float(rng.uniform()),
                    skeleton,
                    track=track,
                )
            )
        else:
            out.append(Instance(skeleton=skeleton, points=pts, track=track))
    return out


@pytest.fixture
def skeleton5():
    sk = Skeleton("t5")
    sk.add_nodes([f"n{i}" for i in range(5)])
    return sk


@pytest.mark.parametrize(
    "fn",
    [
        instance_similarity,
        normalized_instance_similarity,
        centroid_distance,
        instance_iou,
        factory_object_keypoint_similarity(),
        factory_object_keypoint_similarity(keypoint_errors=[1, 2, 3, 2, 1]),
        factory_object_keypoint_similarity(score_weighting=True),
        factory_object_keypoint_similarity(normalization_keypoints="ref"),
        factory_object_keypoint_similarity(normalization_keypoints="union"),
    ],
    ids=[
        "instance",
        "normalized",
        "centroid",
        "iou",
        "oks",
        "oks_errors",
        "oks_weighted",
        "oks_ref",
        "oks_union",
    ],
)
def test_batch_similarity_matches_scalar(skeleton5, fn):
    rng = np.random.default_rng(7)
    refs = _random_instances(skeleton5, 4, rng)
    queries = _random_instances(skeleton5, 3, rng)
    # Mix in a fully-NaN ref (n_vis == 0 -> NaN similarity) and a non-predicted
    # ref (exercises the score-weighting isinstance branch).
    refs.append(
        PredictedInstance.from_arrays(
            np.full((5, 2), np.nan), np.ones(5), 0.5, skeleton5
        )
    )
    refs += _random_instances(skeleton5, 1, rng, predicted=False)
    batch = fn.batch_fn(refs, queries)
    with np.errstate(invalid="ignore", divide="ignore"):
        expected = np.array([[fn(r, q) for q in queries] for r in refs])
    # rtol covers the last-ulp difference between scalar np.linalg.norm and
    # its batched axis= form; everything else matches exactly.
    np.testing.assert_allclose(batch, expected, rtol=1e-12, atol=0)


def test_from_candidate_instances_batch_equals_generic(skeleton5):
    rng = np.random.default_rng(3)
    tracks = [Track(name=f"t{i}") for i in range(3)]
    candidates = _random_instances(skeleton5, 7, rng, tracks=tracks)
    untracked = _random_instances(skeleton5, 4, rng)
    for robust in (1.0, 0.75):
        fast = FrameMatches.from_candidate_instances(
            untracked, candidates, instance_similarity, hungarian_matching,
            robust_best_instance=robust,
        )
        # A bare lambda has no batch_fn, forcing the scalar pairwise loop.
        slow = FrameMatches.from_candidate_instances(
            untracked, candidates,
            lambda r, q: instance_similarity(r, q), hungarian_matching,
            robust_best_instance=robust,
        )
        np.testing.assert_array_equal(fast.cost_matrix, slow.cost_matrix)
        assert [(m.track.name, m.score) for m in fast.matches] == [
            (m.track.name, m.score) for m in slow.matches
        ]
        assert len(fast.unmatched_instances) == len(slow.unmatched_instances)
