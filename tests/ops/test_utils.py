"""ops/utils helpers: group_array, inclusive-pixel IoU, match_points
(reference sleap/nn/utils.py:10,45,101)."""

import numpy as np

from sleap_tpu.ops.utils import compute_iou, group_array, match_points


def test_group_array():
    grouped = group_array(np.arange(5), np.array([1, 5, 2, 1, 5]))
    np.testing.assert_array_equal(grouped[1], [0, 3])
    np.testing.assert_array_equal(grouped[5], [1, 4])
    np.testing.assert_array_equal(grouped[2], [2])


def test_group_array_axis():
    X = np.arange(12).reshape(3, 4)
    grouped = group_array(X, np.array(["a", "b", "a"]))
    assert grouped["a"].shape == (2, 4)
    np.testing.assert_array_equal(grouped["a"][1], X[2])


def test_compute_iou_inclusive_pixels():
    # Identical 2x2-pixel boxes.
    assert compute_iou(np.array([0, 0, 1, 1]), np.array([0, 0, 1, 1])) == 1.0
    # Sharing exactly one pixel row/col: inter = 1, union = 4 + 4 - 1.
    v = compute_iou(np.array([0, 0, 1, 1]), np.array([1, 1, 2, 2]))
    assert v == 1 / 7
    # Disjoint.
    assert compute_iou(np.array([0, 0, 1, 1]), np.array([5, 5, 6, 6])) == 0.0


def test_match_points_square():
    p1 = np.array([[0.0, 0.0], [10.0, 10.0]])
    p2 = np.array([[10.1, 10.0], [0.0, 0.2]])  # reversed order
    i1, i2 = match_points(p1, p2)
    pairs = dict(zip(i1.tolist(), i2.tolist()))
    assert pairs == {0: 1, 1: 0}


def test_match_points_rectangular():
    p1 = np.array([[0.0, 0.0], [5.0, 5.0], [20.0, 20.0]])
    p2 = np.array([[5.2, 5.0], [19.8, 20.0]])
    i1, i2 = match_points(p1, p2)
    assert len(i1) == 2
    pairs = dict(zip(i1.tolist(), i2.tolist()))
    assert pairs == {1: 0, 2: 1}
