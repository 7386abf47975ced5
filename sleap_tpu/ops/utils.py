"""Generic grouping/matching utilities used by training and inference.

Rebuild of ``/root/reference/sleap/nn/utils.py`` (160 LoC). The reference's
``tf_linear_sum_assignment`` (a scipy py_function round-trip) is replaced by
the on-chip batched LAP solver in :mod:`sleap_tpu.ops.lap`; ``match_points``
here runs fully on-device. ``reset_input_layer`` has no JAX analog — flax
modules are shape-polymorphic until ``init``, so rebuilding a model at a new
input shape is just re-initializing (see ``Model.init``).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from sleap_tpu.ops.lap import solve_lap


def group_array(
    X: np.ndarray, groups: np.ndarray, axis: int = 0
) -> Dict[object, np.ndarray]:
    """Group slices of ``X`` along ``axis`` into a dict keyed by ``groups``.

    Example::

        >>> group_array(np.arange(5), np.array([1, 5, 2, 1, 5]))
        {1: array([0, 3]), 5: array([1, 4]), 2: array([2])}
    """
    group_inds = defaultdict(list)
    for ind, key in enumerate(groups):
        group_inds[key].append(ind)
    return {key: np.take(X, inds, axis=axis) for key, inds in group_inds.items()}


def compute_iou(bbox1: np.ndarray, bbox2: np.ndarray) -> float:
    """IoU of two ``[y1, x1, y2, x2]`` boxes (inclusive-pixel convention:
    widths/heights count ``+1`` as in the reference)."""
    b1y1, b1x1, b1y2, b1x2 = bbox1
    b2y1, b2x1, b2y2, b2x2 = bbox2
    iy = max(min(b1y2, b2y2) - max(b1y1, b2y1) + 1, 0)
    ix = max(min(b1x2, b2x2) - max(b1x1, b2x1) + 1, 0)
    inter = ix * iy
    a1 = (b1x2 - b1x1 + 1) * (b1y2 - b1y1 + 1)
    a2 = (b2x2 - b2x1 + 1) * (b2y2 - b2y1 + 1)
    return inter / (a1 + a2 - inter)


def match_points(points1, points2) -> Tuple[np.ndarray, np.ndarray]:
    """Optimally match two point sets by Euclidean distance.

    Returns ``(inds1, inds2)`` index vectors of length ``min(N, M)`` such
    that ``points1[inds1[k]]`` pairs with ``points2[inds2[k]]`` under a
    minimum-total-distance (Hungarian) assignment.
    """
    p1 = jnp.asarray(points1, jnp.float32)
    p2 = jnp.asarray(points2, jnp.float32)
    n, m = p1.shape[0], p2.shape[0]
    dists = jnp.linalg.norm(p1[:, None, :] - p2[None, :, :], axis=-1)
    # solve_lap works on square padded matrices; pad with a large constant
    # that cannot beat any real pairing.
    k = max(n, m)
    cost = jnp.full((k, k), 1e3, jnp.float32).at[:n, :m].set(dists)
    col4row, _ = solve_lap(cost)
    cols = np.asarray(col4row)  # cols[i] = column assigned to row i
    rows = np.arange(k)
    keep = (rows < n) & (cols < m)
    return rows[keep].astype(np.int32), cols[keep].astype(np.int32)
