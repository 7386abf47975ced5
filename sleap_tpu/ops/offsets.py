"""Offset-regression ground-truth codecs (JAX).

Rebuild of ``/root/reference/sleap/nn/data/offset_regression.py:6,59``
(``make_offsets``, ``mask_offsets``) with identical semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_offsets(
    points: jnp.ndarray, xv: jnp.ndarray, yv: jnp.ndarray, stride: int = 1
) -> jnp.ndarray:
    """Dense maps of (dx, dy) from every grid point toward each target point.

    Args:
        points: (n_points, 2) xy in full-image pixels; NaN = missing.

    Returns:
        (grid_height, grid_width, n_points, 2) float32, divided by ``stride``;
        non-finite values (missing points) are zeroed.
    """
    xvb = xv.reshape(1, -1, 1, 1)
    yvb = yv.reshape(-1, 1, 1, 1)
    x = points[:, 0].reshape(1, 1, -1, 1)
    y = points[:, 1].reshape(1, 1, -1, 1)
    dx = jnp.broadcast_to(x - xvb, (yv.shape[0], xv.shape[0], points.shape[0], 1))
    dy = jnp.broadcast_to(y - yvb, (yv.shape[0], xv.shape[0], points.shape[0], 1))
    offsets = jnp.concatenate([dx, dy], axis=-1) / float(stride)
    return jnp.where(jnp.isfinite(offsets), offsets, 0.0)


def mask_offsets(
    offsets: jnp.ndarray, confmaps: jnp.ndarray, threshold: float = 0.2
) -> jnp.ndarray:
    """Zero offsets wherever the matching confmap is at or below threshold."""
    return jnp.where(confmaps[..., None] > threshold, offsets, 0.0)
