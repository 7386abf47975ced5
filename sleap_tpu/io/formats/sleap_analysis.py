"""SLEAP Analysis HDF5 importer.

Rebuild of ``/root/reference/sleap/io/format/sleap_analysis.py`` (152 LoC):
reads the ``.analysis.h5`` files produced by
:mod:`sleap_tpu.info.write_tracking_h5` back into :class:`Labels`.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import h5py
import numpy as np

from sleap_tpu.core.instance import LabeledFrame, PredictedInstance, Track
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import DummyVideo, Video


def read_labels(filename: str, video: Optional[Video] = None) -> Labels:
    with h5py.File(filename, "r") as f:
        tracks_mat = f["tracks"][:].T  # stored transposed -> (frames, nodes, 2, tracks)
        occupancy = f["track_occupancy"][:].T  # (tracks, frames)
        node_names = [
            n.decode() if isinstance(n, bytes) else str(n) for n in f["node_names"][:]
        ]
        track_names = [
            t.decode() if isinstance(t, bytes) else str(t)
            for t in (f["track_names"][:] if f["track_names"].shape[0] else [])
        ]
        edge_inds = f["edge_inds"][:] if "edge_inds" in f else np.zeros((0, 2), int)
        if edge_inds.ndim == 2 and edge_inds.shape[0] == 2 and edge_inds.shape[1] != 2:
            edge_inds = edge_inds.T
        point_scores = f["point_scores"][:].T if "point_scores" in f else None
        instance_scores = f["instance_scores"][:].T if "instance_scores" in f else None
        tracking_scores = f["tracking_scores"][:].T if "tracking_scores" in f else None
        video_path = ""
        if "video_path" in f:
            raw = f["video_path"][()]
            video_path = raw.decode() if isinstance(raw, bytes) else str(raw)

    skeleton = Skeleton(name="analysis")
    skeleton.add_nodes(node_names)
    for src, dst in np.atleast_2d(edge_inds):
        try:
            skeleton.add_edge(node_names[int(src)], node_names[int(dst)])
        except (IndexError, ValueError):
            continue

    if video is None:
        if video_path and os.path.exists(video_path):
            video = Video.from_filename(video_path)
        else:
            cand = os.path.join(
                os.path.dirname(os.path.abspath(filename)), os.path.basename(video_path)
            )
            if video_path and os.path.exists(cand):
                video = Video.from_filename(cand)
            else:
                video = Video(
                    backend=DummyVideo(
                        filename=video_path or filename, frames=tracks_mat.shape[0]
                    )
                )

    tracks = [Track(spawned_on=0, name=n) for n in track_names]
    while len(tracks) < tracks_mat.shape[-1]:
        tracks.append(Track(spawned_on=0, name=f"track_{len(tracks)}"))

    lfs = []
    n_frames, n_nodes, _, n_tracks = tracks_mat.shape
    for fi in range(n_frames):
        instances = []
        for ti in range(n_tracks):
            pts = tracks_mat[fi, :, :, ti]
            if np.all(np.isnan(pts)):
                continue
            confs = (
                point_scores[fi, :, ti]
                if point_scores is not None
                else np.ones(n_nodes)
            )
            inst = PredictedInstance.from_arrays(
                points=pts,
                point_confidences=np.nan_to_num(confs),
                instance_score=float(
                    np.nan_to_num(instance_scores[fi, ti])
                    if instance_scores is not None
                    else 1.0
                ),
                skeleton=skeleton,
                track=tracks[ti],
                tracking_score=float(
                    np.nan_to_num(tracking_scores[fi, ti])
                    if tracking_scores is not None
                    else 0.0
                ),
            )
            instances.append(inst)
        if instances:
            lfs.append(LabeledFrame(video=video, frame_idx=fi, instances=instances))
    return Labels(
        labeled_frames=lfs, videos=[video], skeletons=[skeleton], tracks=tracks
    )
