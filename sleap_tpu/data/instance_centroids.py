"""Instance centroid computation.

Rebuild of ``/root/reference/sleap/nn/data/instance_centroids.py:55``:
centroid = the anchor part's location, falling back to the midpoint of the
bounding box of visible points when the anchor is missing or unset.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def get_instance_centroids(
    instances: np.ndarray, anchor_ind: Optional[int] = None
) -> np.ndarray:
    """(n_instances, n_nodes, 2) -> (n_instances, 2) anchor/bbox-mid centroids."""
    instances = np.asarray(instances, dtype="f8")
    if instances.size == 0:
        return np.zeros((0, 2))
    # Bbox midpoint over non-NaN points.
    with np.errstate(all="ignore"):
        mins = np.nanmin(instances, axis=1)
        maxs = np.nanmax(instances, axis=1)
    mids = (mins + maxs) / 2.0
    if anchor_ind is None:
        return mids
    anchors = instances[:, anchor_ind, :]
    missing = np.isnan(anchors).any(axis=-1)
    return np.where(missing[:, None], mids, anchors)
