"""Part-affinity-field ground-truth codecs (JAX).

Rebuild of ``/root/reference/sleap/nn/data/edge_maps.py``
(``distance_to_edge:16``, ``make_edge_maps:82``, ``make_pafs:119``,
``make_multi_pafs:165``, ``get_edge_points:214``).

Parity note: the reference feeds *squared* point-to-segment distances into its
unnormalized Gaussian (which squares its argument again), so the edge
confidence is ``exp(-d^4 / (2 sigma^2))`` where ``d`` is Euclidean distance.
We reproduce that exactly — trained models and grouping thresholds depend on
this shape.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sleap_tpu.ops.grid import gaussian_pdf


def distance_to_edge(
    points: jnp.ndarray, edge_source: jnp.ndarray, edge_destination: jnp.ndarray
) -> jnp.ndarray:
    """Squared distance from points to each line segment.

    Args:
        points: (..., 2) query points.
        edge_source / edge_destination: (n_edges, 2) segment endpoints.

    Returns:
        (..., n_edges) squared distances (reference edge_maps.py:16 returns
        squared distances — no sqrt).
    """
    direction = edge_destination - edge_source  # (n_edges, 2)
    edge_length = jnp.maximum(jnp.sum(jnp.square(direction), axis=1), 1.0)

    rel = points[..., None, :] - edge_source  # (..., n_edges, 2)
    t = jnp.sum(rel * direction, axis=-1) / edge_length
    t = jnp.clip(t, 0.0, 1.0)
    return jnp.sum(jnp.square(t[..., None] * direction - rel), axis=-1)


def make_edge_maps(
    xv: jnp.ndarray,
    yv: jnp.ndarray,
    edge_source: jnp.ndarray,
    edge_destination: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """(grid_height, grid_width, n_edges) per-pixel edge confidences."""
    grid = jnp.stack(jnp.meshgrid(xv, yv), axis=-1)  # (H, W, 2)
    distances = distance_to_edge(grid, edge_source, edge_destination)
    return gaussian_pdf(distances, sigma=sigma)


def make_pafs(
    xv: jnp.ndarray,
    yv: jnp.ndarray,
    edge_source: jnp.ndarray,
    edge_destination: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """(grid_height, grid_width, n_edges, 2) unit-vector fields × confidence."""
    direction = edge_destination - edge_source
    unit = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    conf = make_edge_maps(xv, yv, edge_source, edge_destination, sigma)
    return conf[..., None] * unit.reshape(1, 1, *unit.shape)


def make_multi_pafs(
    xv: jnp.ndarray,
    yv: jnp.ndarray,
    edge_sources: jnp.ndarray,
    edge_destinations: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Sum of per-instance PAFs; NaN (missing edge) contributions are zeroed.

    Args:
        edge_sources / edge_destinations: (n_instances, n_edges, 2).

    Returns:
        (grid_height, grid_width, n_edges, 2) float32.
    """
    pafs = jax.vmap(lambda s, d: make_pafs(xv, yv, s, d, sigma))(
        edge_sources, edge_destinations
    )
    return jnp.sum(jnp.nan_to_num(pafs, nan=0.0), axis=0)


def get_edge_points(
    instances: jnp.ndarray, edge_inds: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather (n_instances, n_edges, 2) source/destination points per edge."""
    src = jnp.take(instances, edge_inds[:, 0].astype(jnp.int32), axis=1)
    dst = jnp.take(instances, edge_inds[:, 1].astype(jnp.int32), axis=1)
    return src, dst
