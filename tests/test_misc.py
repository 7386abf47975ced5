"""Tests for utility modules: RangeList, util helpers, augmentation, flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sleap_tpu.core.rangelist import RangeList
from sleap_tpu.util import frame_list, make_scoped_dictionary, uniquify, weak_filename_match


def test_rangelist_ops():
    rl = RangeList([(1, 3), (5, 8)])
    rl.insert((3, 5))
    assert rl.list == [(1, 8)]
    rl.remove((4, 6))
    assert rl.list == [(1, 4), (6, 8)]
    before, after = rl.cut(7)
    assert before == [(1, 4), (6, 7)] and after == [(7, 8)]
    assert RangeList.join([[(0, 2)], [(1, 5)]]) == [(0, 5)]
    rl2 = RangeList()
    rl2.add(4)
    rl2.add(5)
    assert rl2.list == [(4, 6)]
    assert rl2.start == 4


def test_util_helpers():
    assert frame_list("1-3,7") == [1, 2, 3, 7]
    assert frame_list("") is None
    assert uniquify([3, 1, 3, 2, 1]) == [3, 1, 2]
    assert weak_filename_match("C:\\data\\vid.mp4", "/other/VID.MP4")
    scoped = make_scoped_dictionary({"a.x": 1, "a.y": 2, "b.z": 3, "c": 4})
    assert scoped == {"a": {"x": 1, "y": 2}, "b": {"z": 3}}


def test_augmentation_identity_when_disabled():
    from sleap_tpu.config import AugmentationConfig
    from sleap_tpu.data.augmentation import augment_example

    rng = jax.random.PRNGKey(0)
    img = jnp.ones((16, 16, 1)) * 0.5
    pts = jnp.array([[[4.0, 5.0], [10.0, 11.0]]])
    out_img, out_pts = augment_example(rng, img, pts, AugmentationConfig())
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img))
    np.testing.assert_allclose(np.asarray(out_pts), np.asarray(pts))


def test_augmentation_rotation_keypoint_consistency():
    """A bright dot and its keypoint stay together under rotation."""
    from sleap_tpu.config import AugmentationConfig
    from sleap_tpu.data.augmentation import augment_example

    img = jnp.zeros((33, 33, 1)).at[8, 20, 0].set(1.0)
    pts = jnp.array([[[20.0, 8.0], [16.0, 16.0]]])
    cfg = AugmentationConfig(rotate=True, rotation_min_angle=30, rotation_max_angle=30)
    out_img, out_pts = augment_example(jax.random.PRNGKey(1), img, pts, cfg)
    # Find brightest pixel in warped image; compare to warped keypoint.
    idx = jnp.argmax(out_img[..., 0])
    y, x = int(idx) // 33, int(idx) % 33
    np.testing.assert_allclose(
        np.asarray(out_pts[0, 0]), [x, y], atol=1.0
    )
    # Center point is invariant to rotation about the center.
    np.testing.assert_allclose(np.asarray(out_pts[0, 1]), [16, 16], atol=1e-3)


def test_flip_symmetry_swap():
    from sleap_tpu.data.augmentation import flip_instances_lr

    pts = jnp.array([[[2.0, 3.0], [10.0, 3.0]]])
    flipped = flip_instances_lr(pts, img_width=16, flip_idx=jnp.array([1, 0]))
    # x mirrored and node order swapped.
    np.testing.assert_allclose(np.asarray(flipped[0]), [[5.0, 3.0], [13.0, 3.0]])


def test_lk_flow_recovers_shift():
    import cv2

    from sleap_tpu.ops.optical_flow import lk_flow

    rng = np.random.default_rng(0)
    base = cv2.GaussianBlur(rng.uniform(0, 255, (96, 96)).astype("f4"), (7, 7), 2.0)
    M = np.float32([[1, 0, 2.5], [0, 1, -1.5]])
    new = cv2.warpAffine(base, M, (96, 96))
    pts = np.array([[30.0, 40.0], [60.0, 50.0]], "f4")
    shifted, status, errs = lk_flow(jnp.asarray(base), jnp.asarray(new), jnp.asarray(pts))
    assert np.asarray(status).all()
    np.testing.assert_allclose(
        np.asarray(shifted), pts + np.array([2.5, -1.5]), atol=0.1
    )


def test_prefetcher_propagates_errors_and_order():
    from sleap_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(10)))) == list(range(10))

    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_size_matching_batches():
    from sleap_tpu.data.providers import resize_and_pad_example

    img = np.full((50, 100, 1), 200, "uint8")
    out, scale = resize_and_pad_example(img, (100, 100))
    assert out.shape == (100, 100, 1)
    assert scale == pytest.approx(1.0)
    assert out[:50].mean() > 150 and out[60:].mean() == 0
