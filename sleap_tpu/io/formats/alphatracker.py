"""AlphaTracker JSON importer.

Rebuild of ``/root/reference/sleap/io/format/alphatracker.py`` (442 LoC):
per-image entries with annotations alternating a "Face" bbox per animal
followed by that animal's "point" keypoints.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from sleap_tpu.core.instance import Instance, LabeledFrame
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video


def read_labels(filename: str, skeleton: Optional[Skeleton] = None) -> Labels:
    with open(filename) as f:
        data = json.load(f)
    base_dir = os.path.dirname(os.path.abspath(filename))

    # Determine max keypoints per animal to size the skeleton.
    max_pts = 0
    for entry in data:
        count = 0
        for ann in entry.get("annotations", []):
            if ann.get("class") == "Face":
                count = 0
            elif ann.get("class") == "point":
                count += 1
                max_pts = max(max_pts, count)

    if skeleton is None:
        skeleton = Skeleton(name="alphatracker")
        skeleton.add_nodes([str(i + 1) for i in range(max_pts)])

    img_paths = []
    for entry in data:
        fn = entry.get("filename") or entry.get("file") or ""
        path = fn if os.path.exists(fn) else os.path.join(base_dir, os.path.basename(fn))
        img_paths.append(path)
    video = Video.from_image_filenames(img_paths)

    lfs = []
    for frame_idx, entry in enumerate(data):
        instances: List[Instance] = []
        current: Optional[np.ndarray] = None
        n = 0
        for ann in entry.get("annotations", []):
            if ann.get("class") == "Face":
                if current is not None:
                    instances.append(Instance(skeleton=skeleton, points=current))
                current = np.full((skeleton.n_nodes, 2), np.nan)
                n = 0
            elif ann.get("class") == "point" and current is not None:
                if n < skeleton.n_nodes:
                    current[n] = (ann["x"], ann["y"])
                n += 1
        if current is not None:
            instances.append(Instance(skeleton=skeleton, points=current))
        if instances:
            lfs.append(LabeledFrame(video=video, frame_idx=frame_idx, instances=instances))
    return Labels(labeled_frames=lfs, videos=[video], skeletons=[skeleton])
