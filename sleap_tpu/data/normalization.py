"""Image normalization ops (JAX, on-chip).

Rebuild of ``/root/reference/sleap/nn/data/normalization.py`` free functions.
These run inside jitted inference/training steps so raw uint8 frames can be
transferred to the device and normalized there (saving 4x host->HBM
bandwidth vs transferring float32).
"""

from __future__ import annotations

import jax.numpy as jnp

# ITU-R 601 luma coefficients (same as tf.image.rgb_to_grayscale).
_RGB_WEIGHTS = jnp.array([0.2989, 0.5870, 0.1140], dtype=jnp.float32)


def ensure_grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3|1) -> (..., H, W, 1); RGB converted by ITU-R 601 luma."""
    if image.shape[-1] == 3:
        f = image.astype(jnp.float32)
        gray = jnp.tensordot(f, _RGB_WEIGHTS, axes=[[-1], [0]])[..., None]
        if jnp.issubdtype(image.dtype, jnp.integer):
            gray = jnp.round(gray).astype(image.dtype)
        else:
            gray = gray.astype(image.dtype)
        return gray
    return image


def ensure_rgb(image: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 1|3) -> (..., H, W, 3) by channel replication."""
    if image.shape[-1] == 1:
        return jnp.tile(image, (1,) * (image.ndim - 1) + (3,))
    return image


def ensure_float(image: jnp.ndarray) -> jnp.ndarray:
    """Integer images -> float32 in [0, 1]; float images passed through.

    Integer scaling divides by the dtype max like the reference's
    ``tf.image.convert_image_dtype`` (normalization.py ``ensure_float``):
    uint8 -> /255, uint16 -> /65535.
    """
    if jnp.issubdtype(image.dtype, jnp.integer):
        return image.astype(jnp.float32) / float(jnp.iinfo(image.dtype).max)
    return image.astype(jnp.float32)


def ensure_int(image: jnp.ndarray) -> jnp.ndarray:
    """Float images -> uint8; [0, 1]-ranged floats are scaled to [0, 255]
    first, wider-ranged floats are cast directly (truncating), integer
    images pass through (reference normalization.py:52).

    jit-safe: the range check is a traced select, not a Python branch.
    """
    if not jnp.issubdtype(image.dtype, jnp.floating):
        return image
    scaled = jnp.where(image.max() <= 1.0, image * 255.0, image)
    return jnp.clip(scaled, 0, 255).astype(jnp.uint8)


def convert_rgb_to_bgr(image: jnp.ndarray) -> jnp.ndarray:
    """Reverse the channel axis (grayscale is RGB-expanded first;
    reference normalization.py:117)."""
    return ensure_rgb(image)[..., ::-1]


def ensure_min_image_rank(image: jnp.ndarray) -> jnp.ndarray:
    """Append a channel axis to a rank-2 (H, W) image (reference
    normalization.py:28)."""
    if image.ndim == 2:
        return image[..., None]
    return image


def scale_image_range(image: jnp.ndarray, min_val: float, max_val: float) -> jnp.ndarray:
    """Rescale a [0, 1] image to [min_val, max_val] (imagenet-style modes)."""
    return image * (max_val - min_val) + min_val


# ImageNet statistics (reference normalization.py imagenet modes).
_IMAGENET_MEAN_RGB = jnp.array([0.485, 0.456, 0.406], dtype=jnp.float32)
_IMAGENET_STD_RGB = jnp.array([0.229, 0.224, 0.225], dtype=jnp.float32)


def scale_to_imagenet_torch_mode(image: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float RGB -> torch-style standardized (reference "torch" mode)."""
    return (image - _IMAGENET_MEAN_RGB) / _IMAGENET_STD_RGB


def scale_to_imagenet_caffe_mode(image: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float RGB -> caffe-style BGR mean-subtracted 0-255."""
    bgr = image[..., ::-1] * 255.0
    return bgr - jnp.array([103.939, 116.779, 123.68], dtype=jnp.float32)


def scale_to_imagenet_tf_mode(image: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float -> [-1, 1] (reference "tf" mode)."""
    return image * 2.0 - 1.0


def apply_imagenet_mode(image: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "tf":
        return scale_to_imagenet_tf_mode(image)
    if mode == "caffe":
        return scale_to_imagenet_caffe_mode(image)
    if mode == "torch":
        return scale_to_imagenet_torch_mode(image)
    raise ValueError(f"Unknown imagenet mode: {mode!r}")
