"""Sampling-grid utilities (JAX).

Rebuild of ``/root/reference/sleap/nn/data/utils.py:41`` (``make_grid_vectors``)
with identical conventions: grid vectors hold full-image pixel coordinates
sampled every ``output_stride`` pixels, so ``grid_width = image_width //
output_stride`` and values span ``[0, image_width)``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def make_grid_vectors(
    image_height: int, image_width: int, output_stride: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (xv, yv) float32 grid vectors in full-image pixel units."""
    xv = jnp.arange(0, image_width, output_stride, dtype=jnp.float32)
    yv = jnp.arange(0, image_height, output_stride, dtype=jnp.float32)
    return xv, yv


def gaussian_pdf(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Unnormalized 0-centered Gaussian PDF: value 1.0 at x == 0."""
    return jnp.exp(-(jnp.square(x)) / (2 * sigma**2))
