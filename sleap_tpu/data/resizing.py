"""Image resizing / padding ops (JAX, on-chip).

Rebuild of ``/root/reference/sleap/nn/data/resizing.py`` free functions
(``find_padding_for_stride:10``, ``pad_to_stride``, ``resize_image``) plus the
SizeMatcher resize-and-pad-to-target transform (resizing.py:257) as a pure
function. All shapes are static under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def find_padding_for_stride(
    image_height: int, image_width: int, max_stride: int
) -> Tuple[int, int]:
    """(pad_bottom, pad_right) so both dims are divisible by max_stride."""
    pad_bottom = (max_stride - (image_height % max_stride)) % max_stride
    pad_right = (max_stride - (image_width % max_stride)) % max_stride
    return pad_bottom, pad_right


def pad_to_stride(image: jnp.ndarray, max_stride: int) -> jnp.ndarray:
    """Zero-pad bottom/right so height and width divide max_stride."""
    pad_bottom, pad_right = find_padding_for_stride(
        image.shape[-3], image.shape[-2], max_stride
    )
    if pad_bottom == 0 and pad_right == 0:
        return image
    pads = [(0, 0)] * image.ndim
    pads[-3] = (0, pad_bottom)
    pads[-2] = (0, pad_right)
    return jnp.pad(image, pads)


def resize_image(image: jnp.ndarray, scale) -> jnp.ndarray:
    """Bilinear resize by a scale factor.

    Matches the reference exactly (resizing.py:71-96): ``scale`` is a float
    or an ``[scale_x, scale_y]`` pair, the new size is the *truncated*
    ``int(dim * scale)``, and the result is cast back to the input dtype
    (truncating for integer images).
    """
    if isinstance(scale, (tuple, list)):
        scale_x, scale_y = float(scale[0]), float(scale[1])
    else:
        scale_x = scale_y = float(scale)
    if scale_x == 1.0 and scale_y == 1.0:
        return image
    h, w = image.shape[-3], image.shape[-2]
    new_h, new_w = int(h * scale_y), int(w * scale_x)
    new_shape = image.shape[:-3] + (new_h, new_w, image.shape[-1])
    resized = jax.image.resize(image.astype(jnp.float32), new_shape, method="bilinear", antialias=False)
    if jnp.issubdtype(image.dtype, jnp.integer):
        resized = jnp.trunc(resized)
    return resized.astype(image.dtype)


def resize_and_pad_to_target(
    image: jnp.ndarray, target_height: int, target_width: int
) -> Tuple[jnp.ndarray, float]:
    """SizeMatcher transform: scale to fit inside target, pad bottom/right.

    Returns (padded image, scale). Points map back as ``pts / scale``.
    """
    h, w = image.shape[-3], image.shape[-2]
    scale = min(target_height / h, target_width / w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    new_shape = image.shape[:-3] + (new_h, new_w, image.shape[-1])
    resized = jax.image.resize(image.astype(jnp.float32), new_shape, method="bilinear", antialias=False)
    pads = [(0, 0)] * image.ndim
    pads[-3] = (0, target_height - new_h)
    pads[-2] = (0, target_width - new_w)
    return jnp.pad(resized, pads), scale


class PointsRescaler:
    """Pipeline block that applies or inverts a scale on predicted points.

    Rebuild of ``/root/reference/sleap/nn/data/resizing.py:473``
    (``PointsRescaler``): follows the example-dict block protocol used by
    :mod:`sleap_tpu.data.inference` — ``input_keys``/``output_keys`` plus
    ``transform_dataset(examples)`` yielding updated dicts.
    """

    def __init__(
        self,
        points_key: str = "predicted_instances",
        scale_key: str = "scale",
        invert: bool = True,
    ):
        self.points_key = points_key
        self.scale_key = scale_key
        self.invert = invert

    @property
    def input_keys(self):
        return [self.points_key, self.scale_key]

    @property
    def output_keys(self):
        return self.input_keys

    def transform_dataset(self, examples):
        import numpy as np

        from sleap_tpu.data.utils import expand_to_rank

        for ex in examples:
            points = np.asarray(ex[self.points_key], dtype=np.float32)
            scale = expand_to_rank(
                np.asarray(ex[self.scale_key], dtype=np.float32), points.ndim
            )
            ex = dict(ex)
            ex[self.points_key] = points / scale if self.invert else points * scale
            yield ex
