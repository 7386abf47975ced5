"""MoveNet adapter (gated).

Reference analog: ``/root/reference/sleap/nn/inference.py:4608-4721`` — a
tf-hub MoveNet lightning/thunder model wrapped as a drop-in single-instance
predictor on the 17-keypoint COCO skeleton. The reference downloads the model
from TF Hub at runtime; this environment has no network egress and no TF-hub
models cached, so construction raises with instructions. The COCO-17 skeleton
helper is provided for code that only needs the keypoint layout.
"""

from __future__ import annotations

from typing import List

from sleap_tpu.core.skeleton import Skeleton

MOVENET_MODELS = {
    "lightning": {"image_size": 192},
    "thunder": {"image_size": 256},
}

COCO_17_NODES: List[str] = [
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
]

COCO_17_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 4), (0, 5), (0, 6), (5, 7), (7, 9),
    (6, 8), (8, 10), (5, 6), (5, 11), (6, 12), (11, 12), (11, 13),
    (13, 15), (12, 14), (14, 16),
]


def movenet_skeleton() -> Skeleton:
    """The 17-keypoint COCO skeleton MoveNet predicts."""
    return Skeleton.from_names_and_edge_inds(
        COCO_17_NODES, COCO_17_EDGES, name="movenet"
    )


class MoveNetPredictor:
    """Gated: requires a downloaded MoveNet model (no egress here)."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "MoveNet inference requires the TF-Hub MoveNet saved model, which "
            "cannot be downloaded in this offline environment. Convert a "
            "locally available MoveNet to StableHLO and load it via "
            "sleap_tpu.inference.export.load_exported_model instead."
        )
