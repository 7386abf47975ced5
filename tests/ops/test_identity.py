import numpy as np
import pytest

import jax.numpy as jnp

from sleap_tpu.ops.identity import (
    _assign_classes,
    classify_peaks_from_maps,
    classify_peaks_from_vectors,
)


def test_assign_classes_basic():
    probs = np.array(
        [[[0.9, 0.1], [0.2, 0.8], [0.5, 0.5]]], dtype="f4"
    )  # 3 peaks, 2 classes
    mask = np.ones((1, 3), bool)
    pfc, valid = _assign_classes(jnp.asarray(probs), jnp.asarray(mask))
    pfc, valid = np.asarray(pfc), np.asarray(valid)
    assert pfc[0, 0] == 0 and pfc[0, 1] == 1
    assert valid[0].all()


def test_assign_classes_drops_non_best_match():
    # Both peaks prefer class 0; Hungarian assigns one to class 1, which is
    # then dropped because class 1 is not that peak's best class.
    probs = np.array([[[0.9, 0.1], [0.8, 0.2]]], dtype="f4")
    mask = np.ones((1, 2), bool)
    pfc, valid = _assign_classes(jnp.asarray(probs), jnp.asarray(mask))
    valid = np.asarray(valid)
    assert valid[0, 0] and not valid[0, 1]


def test_assign_classes_invalid_peaks_excluded():
    probs = np.array([[[0.9, 0.1], [0.1, 0.9]]], dtype="f4")
    mask = np.array([[True, False]])
    pfc, valid = _assign_classes(jnp.asarray(probs), jnp.asarray(mask))
    valid = np.asarray(valid)
    assert valid[0, 0] and not valid[0, 1]


def test_assign_classes_saturated_probs():
    """Regression: PAD cost magnitude must not destroy f32 optimality."""
    probs = np.zeros((1, 8, 2), "f4")
    probs[0, 0] = [0.9999459, 1.8e-10]
    probs[0, 1] = [0.9999945, 3.5e-12]
    probs[0, 2] = [3.7e-14, 1.0]
    probs[0, 3] = [1.09e-13, 1.0]
    probs[0, 4] = [4.3e-12, 0.725]
    mask = np.ones((1, 8), bool)
    mask[0, 5:] = False
    pfc, valid = _assign_classes(jnp.asarray(probs), jnp.asarray(mask))
    pfc, valid = np.asarray(pfc), np.asarray(valid)
    assert valid[0].all()
    assert pfc[0, 0] in (0, 1)  # class 0 gets a class-0-preferring peak
    assert pfc[0, 1] in (2, 3)


def test_classify_peaks_from_maps():
    # 2 nodes (channels), 2 classes, K=2; class maps constant per half.
    S, H, W = 1, 16, 16
    class_maps = np.zeros((S, H, W, 2), "f4")
    class_maps[:, :, :8, 0] = 1.0  # left = class 0
    class_maps[:, :, 8:, 1] = 1.0  # right = class 1
    peaks = np.full((S, 2, 2, 2), np.nan, "f4")
    peaks[0, 0, 0] = [2.0, 3.0]   # node 0, left -> class 0
    peaks[0, 0, 1] = [12.0, 3.0]  # node 0, right -> class 1
    peaks[0, 1, 0] = [3.0, 9.0]   # node 1, left -> class 0
    vals = np.ones((S, 2, 2), "f4") * 0.9
    mask = ~np.isnan(peaks[..., 0])
    pts, pvals, probs = classify_peaks_from_maps(
        jnp.asarray(class_maps), jnp.asarray(peaks), jnp.asarray(vals), jnp.asarray(mask)
    )
    pts = np.asarray(pts)
    np.testing.assert_allclose(pts[0, 0, 0], [2.0, 3.0])
    np.testing.assert_allclose(pts[0, 1, 0], [12.0, 3.0])
    np.testing.assert_allclose(pts[0, 0, 1], [3.0, 9.0])
    assert np.isnan(pts[0, 1, 1]).all()  # class 1 node 1: no peak


def test_classify_peaks_from_vectors():
    S, K, C = 1, 3, 2
    peaks = np.arange(S * K * C * 2, dtype="f4").reshape(S, K, C, 2)
    vals = np.ones((S, K, C), "f4")
    class_probs = np.array([[[0.9, 0.1], [0.1, 0.9], [0.5, 0.5]]], "f4")
    mask = np.array([[True, True, False]])
    pts, pvals, probs = classify_peaks_from_vectors(
        jnp.asarray(peaks), jnp.asarray(vals), jnp.asarray(class_probs), jnp.asarray(mask)
    )
    pts = np.asarray(pts)
    np.testing.assert_allclose(pts[0, 0], peaks[0, 0])  # class 0 <- crop 0
    np.testing.assert_allclose(pts[0, 1], peaks[0, 1])  # class 1 <- crop 1
    probs = np.asarray(probs)
    assert probs[0, 0, 0] == pytest.approx(0.9)
    assert probs[0, 1, 0] == pytest.approx(0.9)
