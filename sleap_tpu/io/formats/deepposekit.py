"""DeepPoseKit HDF5 importer.

Rebuild of ``/root/reference/sleap/io/format/deepposekit.py`` (95 LoC): a
``pose`` dataset of shape (tracks, frames, nodes, 3) plus a skeleton CSV
(name, parent, swap columns).
"""

from __future__ import annotations

import numpy as np

from sleap_tpu.core.instance import Instance, LabeledFrame, Track
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video


def read_labels(filename: str, video_path: str, skeleton_path: str) -> Labels:
    import csv

    import h5py

    video = Video.from_filename(video_path)

    skeleton = Skeleton(name="deepposekit")
    with open(skeleton_path) as f:
        rows = list(csv.DictReader(f))
    for row in rows:
        skeleton.add_node(row["name"])
    for row in rows:
        parent = row.get("parent", "")
        if parent and parent.lower() != "nan":
            skeleton.add_edge(parent, row["name"])
    for row in rows:
        swap = row.get("swap", "") or row.get("swap_index", "")
        if swap and swap.lower() != "nan" and skeleton.has_node(swap):
            try:
                skeleton.add_symmetry(row["name"], swap)
            except ValueError:
                pass

    with h5py.File(filename, "r") as f:
        pose = f["pose"][:]
    track_count, frame_count, node_count, _ = pose.shape
    tracks = [Track(0, f"Track {i}") for i in range(track_count)]

    lfs = []
    for frame_idx in range(frame_count):
        instances = []
        for ti in range(track_count):
            pts = pose[ti, frame_idx, :, :2].astype("f8")
            instances.append(
                Instance(skeleton=skeleton, points=pts, track=tracks[ti])
            )
        lfs.append(LabeledFrame(video, frame_idx=frame_idx, instances=instances))
    return Labels(labeled_frames=lfs, tracks=tracks, skeletons=[skeleton])
