"""Legacy SLEAP JSON labels importer.

Rebuild of ``/root/reference/sleap/io/format/labels_json.py`` (544 LoC) and
``sleap/io/legacy.py``: the pre-HDF5 project format — one JSON document with
``skeletons`` (node-link with integer refs into ``nodes``), ``videos``
(backend dicts), ``labels`` (frames with ``_instances`` and per-node
``_points`` dicts), and ``tracks``. Also handles ``.json.zip`` bundles and
gzip-compressed documents.
"""

from __future__ import annotations

import gzip
import json
import os
import zipfile
from typing import Optional

import numpy as np

from sleap_tpu.core.instance import (
    Instance,
    LabeledFrame,
    PredictedInstance,
    Track,
    empty_points,
)
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Node, Skeleton
from sleap_tpu.io.slp import _make_video_search
from sleap_tpu.io.video import Video


def _load_json_document(filename: str) -> dict:
    if filename.endswith(".zip"):
        with zipfile.ZipFile(filename) as zf:
            json_names = [n for n in zf.namelist() if n.endswith(".json")]
            with zf.open(json_names[0]) as f:
                return json.loads(f.read())
    raw = open(filename, "rb").read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    return json.loads(raw)


def read_labels(
    filename: str, video_search=None
) -> Labels:
    data = _load_json_document(filename)

    nodes = [Node(n["name"], n.get("weight", 1.0)) for n in data.get("nodes", [])]
    skeletons = [
        Skeleton.from_dict(sd, node_list=nodes) for sd in data.get("skeletons", [])
    ]

    search = _make_video_search(filename, video_search)
    videos = []
    for vd in data.get("videos", []):
        videos.append(Video.from_dict(vd, video_search=search))

    tracks = []
    for td in data.get("tracks", []):
        if isinstance(td, dict):
            tracks.append(Track(td.get("spawned_on", 0), td.get("name", "")))
        else:
            tracks.append(Track(int(td[0]), str(td[1])))

    lfs = []
    for frame in data.get("labels", []):
        video = videos[int(frame["video"])]
        lf = LabeledFrame(video=video, frame_idx=int(frame["frame_idx"]))
        for inst_d in frame.get("_instances", []):
            skel = skeletons[int(inst_d.get("skeleton", 0))] if skeletons else None
            track = None
            t_ref = inst_d.get("track")
            if t_ref is not None and int(t_ref) < len(tracks):
                track = tracks[int(t_ref)]
            is_pred = "score" in inst_d or inst_d.get(
                "py/object", ""
            ).endswith("PredictedInstance")
            pts = empty_points(skel.n_nodes, predicted=is_pred)
            for key, pd in (inst_d.get("_points") or {}).items():
                ni = int(key)
                if ni >= len(pts):
                    continue
                pts[ni]["x"] = pd.get("x", np.nan)
                pts[ni]["y"] = pd.get("y", np.nan)
                pts[ni]["visible"] = bool(pd.get("visible", True))
                pts[ni]["complete"] = bool(pd.get("complete", False))
                if is_pred:
                    pts[ni]["score"] = pd.get("score", 1.0)
            if is_pred:
                inst = PredictedInstance(
                    skeleton=skel, points=pts, track=track,
                    score=float(inst_d.get("score", 0.0)),
                )
            else:
                inst = Instance(skeleton=skel, points=pts, track=track)
            lf.insert_instance(inst)
        lfs.append(lf)

    return Labels(
        labeled_frames=lfs, videos=videos, skeletons=skeletons, tracks=tracks
    )
