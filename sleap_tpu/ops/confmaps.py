"""Confidence-map ground-truth codecs (JAX, jittable, static shapes).

Rebuild of ``/root/reference/sleap/nn/data/confidence_maps.py`` free functions
(``make_confmaps:10``, ``make_multi_confmaps:57``,
``make_multi_confmaps_with_offsets:113``). Differences from the reference are
purely structural: the per-instance Python loop becomes a ``vmap`` + masked
reduction so the whole codec compiles to one fused XLA computation — instance
count is static (NaN rows = missing), which is the TPU-native contract used
throughout this framework.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sleap_tpu.ops.offsets import make_offsets, mask_offsets


def make_confmaps(
    points: jnp.ndarray, xv: jnp.ndarray, yv: jnp.ndarray, sigma: float
) -> jnp.ndarray:
    """Confidence maps for one instance.

    Args:
        points: (n_nodes, 2) xy in full-image pixels; NaN = missing.
        xv/yv: grid vectors from :func:`make_grid_vectors`.
        sigma: Gaussian stddev in the same units as the grid vectors.

    Returns:
        (grid_height, grid_width, n_nodes) float32; missing nodes are all 0.
    """
    x = points[:, 0].reshape(1, 1, -1)
    y = points[:, 1].reshape(1, 1, -1)
    cm = jnp.exp(
        -(
            (xv.reshape(1, -1, 1) - x) ** 2 + (yv.reshape(-1, 1, 1) - y) ** 2
        )
        / (2 * sigma**2)
    )
    return jnp.nan_to_num(cm, nan=0.0)


def _instances_in_image(
    instances: jnp.ndarray, xv: jnp.ndarray, yv: jnp.ndarray
) -> jnp.ndarray:
    """(n_instances,) bool: any node strictly inside (0, max) on both axes.

    Matches the reference's exclusion of fully out-of-image instances
    (confidence_maps.py:100-106).
    """
    bound = jnp.stack([xv[-1], yv[-1]]).reshape(1, 1, 2)
    inside = (instances > 0) & (instances < bound)
    return jnp.any(jnp.all(inside, axis=-1), axis=1)


def make_multi_confmaps(
    instances: jnp.ndarray, xv: jnp.ndarray, yv: jnp.ndarray, sigma: float
) -> jnp.ndarray:
    """Max-reduced confidence maps over instances.

    Args:
        instances: (n_instances, n_nodes, 2); NaN rows/instances = missing.

    Returns:
        (grid_height, grid_width, n_nodes) float32.
    """
    keep = _instances_in_image(instances, xv, yv)
    cms = jax.vmap(lambda pts: make_confmaps(pts, xv, yv, sigma))(instances)
    cms = jnp.where(keep[:, None, None, None], cms, 0.0)
    return jnp.max(cms, axis=0)


def make_multi_confmaps_with_offsets(
    instances: jnp.ndarray,
    xv: jnp.ndarray,
    yv: jnp.ndarray,
    stride: int,
    sigma: float,
    offsets_threshold: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-instance confmaps plus additively-combined local offset maps.

    Returns:
        cms: (grid_height, grid_width, n_nodes)
        offsets: (grid_height, grid_width, n_nodes, 2), masked to the
            neighborhood where each instance's confmap exceeds the threshold
            and summed over instances (reference confidence_maps.py:113-194).
    """
    keep = _instances_in_image(instances, xv, yv)

    def per_instance(pts):
        cm = make_confmaps(pts, xv, yv, sigma)
        off = mask_offsets(
            make_offsets(pts, xv, yv, stride=stride), cm, threshold=offsets_threshold
        )
        return cm, off

    cms, offs = jax.vmap(per_instance)(instances)
    cms = jnp.where(keep[:, None, None, None], cms, 0.0)
    offs = jnp.where(keep[:, None, None, None, None], offs, 0.0)
    return jnp.max(cms, axis=0), jnp.sum(offs, axis=0)
