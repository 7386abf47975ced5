"""On-chip augmentation semantics (reference sleap/nn/data/augmentation.py:
flip_instances_lr/ud:13,59, AlbumentationsAugmenter, RandomCropper)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sleap_tpu.config import AugmentationConfig
from sleap_tpu.data.augmentation import (
    augment_example,
    flip_instances_lr,
    flip_instances_ud,
)


def test_flip_lr_coordinates_and_symmetry():
    pts = jnp.asarray([[[1.0, 2.0], [5.0, 6.0]]])
    flipped = flip_instances_lr(pts, img_width=10)
    np.testing.assert_allclose(flipped[0, 0], [8.0, 2.0])
    # Symmetric pair swap: node order reverses.
    flip_idx = jnp.asarray([1, 0])
    swapped = flip_instances_lr(pts, 10, flip_idx)
    np.testing.assert_allclose(swapped[0, 0], [4.0, 6.0])


def test_flip_ud_coordinates():
    pts = jnp.asarray([[[1.0, 2.0], [5.0, 6.0]]])
    flipped = flip_instances_ud(pts, img_height=10)
    np.testing.assert_allclose(flipped[0, 0], [1.0, 7.0])
    np.testing.assert_allclose(flipped[0, 1], [5.0, 3.0])


def _example():
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (32, 32, 1)).astype("f4"))
    instances = jnp.asarray([[[8.0, 8.0], [20.0, 24.0]]])
    return image, instances


def test_random_crop_shifts_points():
    image, instances = _example()
    cfg = AugmentationConfig(random_crop=True, random_crop_height=16, random_crop_width=16)
    img2, pts2 = augment_example(jax.random.PRNGKey(3), image, instances, cfg)
    assert img2.shape == (16, 16, 1)
    # The shift applied to points equals the crop offset: the cropped pixel
    # at the shifted point location matches the original pixel at the
    # original location (when inside bounds).
    shift = instances[0, 0] - pts2[0, 0]
    oy, ox = int(shift[1]), int(shift[0])
    np.testing.assert_allclose(
        np.asarray(img2[: 32 - oy, : 32 - ox]),
        np.asarray(image[oy : oy + 16, ox : ox + 16][: 16, : 16]),
        atol=1e-6,
    )


def test_photometric_augs_keep_range_and_points():
    image, instances = _example()
    cfg = AugmentationConfig(
        uniform_noise=True, uniform_noise_min_val=0, uniform_noise_max_val=10,
        gaussian_noise=True, gaussian_noise_mean=5, gaussian_noise_stddev=1,
        contrast=True, contrast_min_gamma=0.8, contrast_max_gamma=1.2,
        brightness=True, brightness_min_val=0, brightness_max_val=10,
    )
    img2, pts2 = augment_example(jax.random.PRNGKey(1), image, instances, cfg)
    assert img2.shape == image.shape
    assert float(img2.min()) >= 0.0 and float(img2.max()) <= 1.0
    np.testing.assert_allclose(pts2, instances)  # photometric: points untouched
    assert not np.allclose(np.asarray(img2), np.asarray(image))


def test_scale_augmentation_consistent():
    image, instances = _example()
    cfg = AugmentationConfig(scale=True, scale_min=2.0, scale_max=2.0)
    img2, pts2 = augment_example(jax.random.PRNGKey(2), image, instances, cfg)
    # Pure 2x zoom about the image center: distances from center double.
    center = jnp.asarray([32 / 2 - 0.5, 32 / 2 - 0.5])
    expected = center + (instances - center) * 2.0
    np.testing.assert_allclose(np.asarray(pts2), np.asarray(expected), atol=1e-3)


def test_nan_points_stay_nan():
    image, _ = _example()
    instances = jnp.asarray([[[8.0, 8.0], [jnp.nan, jnp.nan]]])
    cfg = AugmentationConfig(rotate=True, rotation_min_angle=-30, rotation_max_angle=30)
    _, pts2 = augment_example(jax.random.PRNGKey(4), image, instances, cfg)
    assert np.isfinite(np.asarray(pts2[0, 0])).all()
    assert np.isnan(np.asarray(pts2[0, 1])).all()


def test_determinism_with_same_key():
    image, instances = _example()
    cfg = AugmentationConfig(
        rotate=True, rotation_min_angle=-45, rotation_max_angle=45,
        uniform_noise=True, uniform_noise_min_val=0, uniform_noise_max_val=20,
    )
    a_img, a_pts = augment_example(jax.random.PRNGKey(7), image, instances, cfg)
    b_img, b_pts = augment_example(jax.random.PRNGKey(7), image, instances, cfg)
    np.testing.assert_array_equal(np.asarray(a_img), np.asarray(b_img))
    np.testing.assert_array_equal(np.asarray(a_pts), np.asarray(b_pts))
    c_img, _ = augment_example(jax.random.PRNGKey(8), image, instances, cfg)
    assert not np.array_equal(np.asarray(a_img), np.asarray(c_img))
