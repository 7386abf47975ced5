"""On-chip data augmentation (JAX).

Replaces the reference's albumentations/OpenCV host pipeline
(``/root/reference/sleap/nn/data/augmentation.py:105`` and the
``AugmentationConfig`` options) with jitted, keypoint-consistent transforms:

- geometric: rotation about the image center, isotropic scaling, and
  translation composed into one affine resample (bilinear, zero fill) with
  the exact inverse applied to instance points;
- photometric: uniform/gaussian noise, gamma contrast, brightness;
- flips: symmetric-node-aware horizontal/vertical reflection
  (reference augmentation.py:13 ``flip_instances_lr``).

All transforms take an explicit PRNG key and fixed-shape (image, instances)
pairs, so they fuse into the jitted training step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sleap_tpu.config import AugmentationConfig


def _affine_matrix(
    angle_rad: jnp.ndarray,
    scale: jnp.ndarray,
    translate: jnp.ndarray,
    center: Tuple[float, float],
) -> jnp.ndarray:
    """Forward 3x3 affine mapping input coords -> output coords (xy order)."""
    cx, cy = center
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    rot = jnp.array(
        [[cos, -sin, 0.0], [sin, cos, 0.0], [0.0, 0.0, 1.0]]
    ) * jnp.array([[scale, scale, 1.0], [scale, scale, 1.0], [1.0, 1.0, 1.0]])
    rot = rot.at[2, 2].set(1.0)
    to_origin = jnp.array([[1.0, 0, -cx], [0, 1.0, -cy], [0, 0, 1.0]])
    back = jnp.array(
        [[1.0, 0, cx + translate[0]], [0, 1.0, cy + translate[1]], [0, 0, 1.0]]
    )
    return back @ rot @ to_origin


def apply_affine(
    image: jnp.ndarray, points: jnp.ndarray, matrix: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp (H, W, C) image and (..., 2) xy points by a forward affine."""
    H, W, C = image.shape
    inv = jnp.linalg.inv(matrix)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xx)
    out_coords = jnp.stack([xx, yy, ones], axis=0).reshape(3, -1)
    in_coords = inv @ out_coords  # source xy for each output pixel
    in_x = in_coords[0].reshape(H, W)
    in_y = in_coords[1].reshape(H, W)

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, [in_y, in_x], order=1, mode="constant", cval=0.0
        )

    warped = jax.vmap(sample_channel, in_axes=2, out_axes=2)(
        image.astype(jnp.float32)
    )
    pts = points.reshape(-1, 2)
    pts_h = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1))], axis=1)
    new_pts = (matrix @ pts_h.T).T[:, :2].reshape(points.shape)
    return warped, new_pts


def flip_instances_lr(
    instances: jnp.ndarray, img_width: int, flip_idx: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Horizontal flip with symmetric-node swapping (reference :13)."""
    flipped = instances.at[..., 0].set(img_width - 1 - instances[..., 0])
    if flip_idx is not None:
        flipped = jnp.take(flipped, flip_idx, axis=-2)
    return flipped


def flip_instances_ud(
    instances: jnp.ndarray, img_height: int, flip_idx: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    flipped = instances.at[..., 1].set(img_height - 1 - instances[..., 1])
    if flip_idx is not None:
        flipped = jnp.take(flipped, flip_idx, axis=-2)
    return flipped


def augment_example(
    rng: jax.Array,
    image: jnp.ndarray,
    instances: jnp.ndarray,
    config: AugmentationConfig,
    flip_idx: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the configured augmentations to one (image, instances) example.

    Args:
        image: (H, W, C) float32 in [0, 1].
        instances: (n_instances, n_nodes, 2) xy (NaN-padded).

    Returns:
        (augmented image float32, augmented instances).
    """
    H, W = image.shape[0], image.shape[1]
    keys = jax.random.split(rng, 10)
    image = image.astype(jnp.float32)

    needs_affine = config.rotate or config.scale or config.translate
    if needs_affine:
        angle = jnp.where(
            config.rotate,
            jax.random.uniform(
                keys[0],
                minval=jnp.deg2rad(config.rotation_min_angle),
                maxval=jnp.deg2rad(config.rotation_max_angle),
            ),
            0.0,
        )
        scale = jnp.where(
            config.scale,
            jax.random.uniform(keys[1], minval=config.scale_min, maxval=config.scale_max),
            1.0,
        )
        translate = jnp.where(
            config.translate,
            jax.random.uniform(
                keys[2], (2,), minval=config.translate_min, maxval=config.translate_max
            ),
            jnp.zeros(2),
        )
        matrix = _affine_matrix(angle, scale, translate, (W / 2 - 0.5, H / 2 - 0.5))
        image, instances = apply_affine(image, instances, matrix)

    if config.random_flip:
        do_flip = jax.random.bernoulli(keys[3])
        if config.flip_horizontal:
            flipped_img = image[:, ::-1]
            flipped_pts = flip_instances_lr(instances, W, flip_idx)
        else:
            flipped_img = image[::-1]
            flipped_pts = flip_instances_ud(instances, H, flip_idx)
        image = jnp.where(do_flip, flipped_img, image)
        instances = jnp.where(do_flip, flipped_pts, instances)

    if config.random_crop:
        ch, cw = int(config.random_crop_height), int(config.random_crop_width)
        if ch < H or cw < W:
            oy = jax.random.randint(keys[8], (), 0, max(H - ch, 1))
            ox = jax.random.randint(keys[9], (), 0, max(W - cw, 1))
            image = jax.lax.dynamic_slice(
                image, (oy, ox, 0), (min(ch, H), min(cw, W), image.shape[2])
            )
            offset = jnp.stack([ox, oy]).astype(instances.dtype)
            instances = instances - offset

    if config.uniform_noise:
        # Reference albumentations operates on 0-255; scale to [0, 1] range.
        noise = jax.random.uniform(
            keys[4],
            image.shape,
            minval=config.uniform_noise_min_val / 255.0,
            maxval=config.uniform_noise_max_val / 255.0,
        )
        image = jnp.clip(image + noise, 0.0, 1.0)
    if config.gaussian_noise:
        noise = (
            config.gaussian_noise_mean / 255.0
            + jax.random.normal(keys[5], image.shape)
            * config.gaussian_noise_stddev
            / 255.0
        )
        image = jnp.clip(image + noise, 0.0, 1.0)
    if config.contrast:
        gamma = jax.random.uniform(
            keys[6], minval=config.contrast_min_gamma, maxval=config.contrast_max_gamma
        )
        image = jnp.clip(jnp.power(jnp.maximum(image, 1e-8), gamma), 0.0, 1.0)
    if config.brightness:
        delta = jax.random.uniform(
            keys[7],
            minval=config.brightness_min_val / 255.0,
            maxval=config.brightness_max_val / 255.0,
        )
        image = jnp.clip(image + delta, 0.0, 1.0)

    return image, instances
