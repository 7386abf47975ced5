"""LEAP MATLAB ``labels.mat`` importer.

Rebuild of ``/root/reference/sleap/io/format/leap_matlab.py`` (143 LoC):
``positions (nodes, 2, frames)`` arrays plus a skeleton struct, referencing
an HDF5 box file (``boxPath``).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from sleap_tpu.core.instance import Instance, LabeledFrame
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video


def read_labels(filename: str, gui: bool = False) -> Labels:
    from scipy.io import loadmat

    mat = loadmat(filename)
    positions = mat["positions"]  # (nodes, 2, frames)
    n_nodes = positions.shape[0]

    # Node names / edges from the skeleton struct when present.
    node_names = [str(i + 1) for i in range(n_nodes)]
    edges = []
    if "skeleton" in mat:
        try:
            skel_struct = mat["skeleton"][0, 0]
            fields = skel_struct.dtype.names or ()
            if "nodes" in fields:
                raw = skel_struct["nodes"]
                names = [str(np.squeeze(n)) for n in raw.flatten()]
                if len(names) == n_nodes:
                    node_names = names
            if "edges" in fields:
                edges = (np.asarray(skel_struct["edges"]) - 1).tolist()
        except Exception:
            pass

    skeleton = Skeleton(name="leap")
    skeleton.add_nodes(node_names)
    for e in edges:
        try:
            skeleton.add_edge(node_names[int(e[0])], node_names[int(e[1])])
        except Exception:
            continue

    # Video from the box path if resolvable, else a dummy reference.
    video = None
    if "boxPath" in mat:
        box_path = str(np.squeeze(mat["boxPath"]))
        candidates = [
            box_path,
            os.path.join(os.path.dirname(os.path.abspath(filename)), os.path.basename(box_path)),
        ]
        for cand in candidates:
            if os.path.exists(cand):
                video = Video.from_hdf5(dataset="box", filename=cand, input_format="channels_first")
                break
    if video is None:
        from sleap_tpu.io.video import DummyVideo

        video = Video(backend=DummyVideo(filename="missing_box.h5", frames=positions.shape[2]))

    lfs = []
    for fi in range(positions.shape[2]):
        pts = positions[:, :, fi].astype("f8")
        if np.all(np.isnan(pts)) or np.all(pts == 0):
            continue
        lfs.append(
            LabeledFrame(
                video=video,
                frame_idx=fi,
                instances=[Instance(skeleton=skeleton, points=pts)],
            )
        )
    return Labels(labeled_frames=lfs, videos=[video], skeletons=[skeleton])
