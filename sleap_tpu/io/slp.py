"""Reader/writer for the ``.slp`` labels format (SLEAP HDF5 v1, format_id 1.2).

Interoperates bit-for-bit with the reference adaptor
(``/root/reference/sleap/io/format/hdf5.py:30``): HDF5 file with

- ``metadata`` group: attrs ``format_id`` (float) and ``json`` (the project
  metadata: version, skeletons as node-link dicts with integer node refs,
  ``nodes`` (name/weight list), provenance, negative_anchors).
- ``videos_json`` / ``tracks_json`` / ``suggestions_json``: arrays of JSON
  strings.
- compound datasets ``frames`` / ``instances`` / ``points`` / ``pred_points``
  (layouts at hdf5.py:146-149; format 1.2 adds ``tracking_score`` to
  instances).
- optional embedded frame groups ``video{N}/{video,frame_numbers,
  source_video}`` for ``.pkg.slp`` training packages (video.py:1399).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, Optional, Union

import h5py
import numpy as np

from sleap_tpu.core.instance import (
    POINT_DTYPE,
    PRED_POINT_DTYPE,
    Instance,
    LabeledFrame,
    PredictedInstance,
    Track,
)
from sleap_tpu.core.labels import Labels, SuggestionFrame
from sleap_tpu.core.skeleton import Node, Skeleton
from sleap_tpu.io.video import HDF5Video, NumpyVideo, Video

FORMAT_ID = 1.2

FRAME_DTYPE = np.dtype(
    [
        ("frame_id", "u8"),
        ("video", "u4"),
        ("frame_idx", "u8"),
        ("instance_id_start", "u8"),
        ("instance_id_end", "u8"),
    ]
)

INSTANCE_DTYPE = np.dtype(
    [
        ("instance_id", "i8"),
        ("instance_type", "u1"),
        ("frame_id", "u8"),
        ("skeleton", "u4"),
        ("track", "i4"),
        ("from_predicted", "i8"),
        ("score", "f4"),
        ("point_id_start", "u8"),
        ("point_id_end", "u8"),
        ("tracking_score", "f4"),  # added in format 1.2
    ]
)

USER_INSTANCE = 0
PREDICTED_INSTANCE = 1


def _as_str(raw) -> str:
    if isinstance(raw, bytes):
        return raw.decode()
    if isinstance(raw, np.ndarray):
        return raw.tobytes().decode()
    if isinstance(raw, np.void):
        return bytes(raw).decode()
    return str(raw)


def _make_video_search(
    slp_path: str, video_search: Optional[Union[Callable, List[str]]]
) -> Callable:
    """Resolver for stored (often relative) video paths.

    Tries: user callback/paths, the path as-is, relative to the .slp file's
    directory and its ancestors, then basename next to the .slp file.
    ``video_search=False`` disables searching entirely (reference
    ``load_file(..., detect_videos=False)``): stored paths are kept verbatim.
    """
    slp_dir = os.path.dirname(os.path.abspath(slp_path))

    if video_search is False:
        return lambda path: path

    def search(path: Optional[str]) -> Optional[str]:
        if path is None:
            return None
        if callable(video_search):
            fixed = video_search(path)
            if fixed and os.path.exists(fixed):
                return fixed
        if os.path.exists(path):
            return path
        hints = list(video_search) if isinstance(video_search, (list, tuple)) else []
        # A file hint also stands for its directory (reference
        # find_path_using_paths, dataset.py:2713): try dir(hint)/basename.
        base = os.path.basename(path.replace("\\", "/"))
        for hint in hints:
            if os.path.isfile(hint):
                cand = os.path.join(os.path.dirname(hint), base)
                if os.path.exists(cand):
                    return cand
        anc = slp_dir
        for _ in range(6):
            hints.append(anc)
            anc = os.path.dirname(anc)
        # Try every suffix of the stored path under every hint directory —
        # this resolves paths recorded on other machines/OSes (e.g. Windows
        # drive-absolute paths in the reference fixtures).
        parts = path.replace("\\", "/").split("/")
        suffixes = ["/".join(parts[i:]) for i in range(len(parts))][-6:]
        for hint in hints:
            for suffix in suffixes:
                cand = os.path.join(hint, suffix)
                if os.path.exists(cand):
                    return cand
        return path

    return search


def read_labels(
    filename: str,
    video_search: Optional[Union[Callable, List[str]]] = None,
) -> Labels:
    """Load a ``.slp`` file into a :class:`Labels` object."""
    with h5py.File(filename, "r") as f:
        meta = json.loads(_as_str(f["metadata"].attrs["json"]))
        format_id = float(f["metadata"].attrs.get("format_id", 1.0))

        nodes = [Node(n["name"], n.get("weight", 1.0)) for n in meta.get("nodes", [])]
        skeletons = [
            Skeleton.from_dict(sd, node_list=nodes) for sd in meta.get("skeletons", [])
        ]

        search = _make_video_search(filename, video_search)
        video_dicts = []
        if "videos_json" in f:
            video_dicts = [json.loads(_as_str(raw)) for raw in f["videos_json"][:]]

        # Positional replacement (reference make_video_callback,
        # dataset.py:2678-2694): when as many search paths as videos are
        # given, extensions pairwise match, and the stored paths are still
        # missing after per-path search, each search path replaces the video
        # at its own index.
        positional: Dict[int, str] = {}
        hints = (
            list(video_search)
            if isinstance(video_search, (list, tuple))
            else []
        )
        ext = lambda p: str(p).rsplit(".", 1)[-1]  # noqa: E731
        if hints and len(hints) == len(video_dicts):
            stored = [d.get("backend", {}).get("filename") for d in video_dicts]
            if all(isinstance(s, str) for s in stored) and all(
                ext(s) == ext(h) for s, h in zip(stored, hints)
            ):
                for i, (s, h) in enumerate(zip(stored, hints)):
                    fixed = search(s)
                    if (fixed is None or not os.path.exists(fixed)) and \
                            os.path.exists(str(h)):
                        positional[i] = str(h)

        videos: List[Video] = []
        for i, d in enumerate(video_dicts):
            backend = d.get("backend", {})
            fn = backend.get("filename")
            if fn == "." or fn == filename:
                backend["filename"] = filename
                video = Video.from_dict(d)
            elif i in positional:
                backend["filename"] = positional[i]
                video = Video.from_dict(d)
            else:
                video = Video.from_dict(d, video_search=search)
            videos.append(video)

        tracks: List[Track] = []
        if "tracks_json" in f and f["tracks_json"].shape[0]:
            for raw in f["tracks_json"][:]:
                item = json.loads(_as_str(raw))
                if isinstance(item, dict):
                    tracks.append(
                        Track(spawned_on=item.get("spawned_on", 0), name=item.get("name", ""))
                    )
                else:
                    tracks.append(Track(spawned_on=int(item[0]), name=str(item[1])))

        suggestions: List[SuggestionFrame] = []
        if "suggestions_json" in f and f["suggestions_json"].shape[0]:
            for raw in f["suggestions_json"][:]:
                item = json.loads(_as_str(raw))
                vid_ref = item.get("video")
                try:
                    vid = videos[int(vid_ref)]
                except (TypeError, ValueError, IndexError):
                    continue
                suggestions.append(
                    SuggestionFrame(
                        video=vid,
                        frame_idx=int(item.get("frame_idx", 0)),
                        group=item.get("group"),
                    )
                )

        points = f["points"][:] if "points" in f else np.zeros(0, dtype=POINT_DTYPE)
        pred_points = (
            f["pred_points"][:] if "pred_points" in f else np.zeros(0, dtype=PRED_POINT_DTYPE)
        )
        # Pre-1.1 files stored user points in gridline coordinates (top-left
        # corner at (0, 0) instead of (-0.5, -0.5)); shift user points only,
        # matching reference io/format/hdf5.py:151-155.
        if format_id < 1.1 and points.shape[0]:
            points["x"] -= 0.5
            points["y"] -= 0.5
        inst_table = f["instances"][:] if "instances" in f else np.zeros(0, dtype=INSTANCE_DTYPE)
        frame_table = f["frames"][:] if "frames" in f else np.zeros(0, dtype=FRAME_DTYPE)

    has_tracking_score = "tracking_score" in (inst_table.dtype.names or ())

    # Build instances (two passes to wire from_predicted links).
    instances: List[Instance] = []
    for rec in inst_table:
        skel = skeletons[int(rec["skeleton"])] if skeletons else None
        track = tracks[int(rec["track"])] if int(rec["track"]) >= 0 else None
        i0, i1 = int(rec["point_id_start"]), int(rec["point_id_end"])
        if int(rec["instance_type"]) == PREDICTED_INSTANCE:
            pts = pred_points[i0:i1].astype(PRED_POINT_DTYPE)
            inst = PredictedInstance(
                skeleton=skel,
                points=pts,
                track=track,
                score=float(rec["score"]) if not np.isnan(rec["score"]) else 0.0,
                tracking_score=float(rec["tracking_score"]) if has_tracking_score else 0.0,
            )
        else:
            pts = points[i0:i1].astype(POINT_DTYPE)
            inst = Instance(skeleton=skel, points=pts, track=track)
        instances.append(inst)

    for rec, inst in zip(inst_table, instances):
        fp = int(rec["from_predicted"])
        if fp >= 0 and fp < len(instances):
            inst.from_predicted = instances[fp]

    labeled_frames: List[LabeledFrame] = []
    for rec in frame_table:
        video = videos[int(rec["video"])]
        lf = LabeledFrame(video=video, frame_idx=int(rec["frame_idx"]))
        for inst in instances[int(rec["instance_id_start"]) : int(rec["instance_id_end"])]:
            lf.insert_instance(inst)
        labeled_frames.append(lf)

    return Labels(
        labeled_frames=labeled_frames,
        videos=videos,
        skeletons=skeletons,
        tracks=tracks,
        suggestions=suggestions,
        negative_anchors=meta.get("negative_anchors", {}) or {},
        provenance=meta.get("provenance", {}) or {},
    )


def _serialize_metadata(labels: Labels) -> Dict[str, Any]:
    # Shared node list across all skeletons (order: first appearance).
    all_nodes: List[Node] = []
    for skel in labels.skeletons:
        for node in skel.nodes:
            if node not in all_nodes:
                all_nodes.append(node)
    node_to_idx = {node: i for i, node in enumerate(all_nodes)}
    return {
        "version": "2.0.0",
        "skeletons": [s.to_dict(node_to_idx) for s in labels.skeletons],
        "nodes": [{"name": n.name, "weight": n.weight} for n in all_nodes],
        "videos": [],
        "tracks": [],
        "suggestions": [],
        "negative_anchors": labels.negative_anchors
        if isinstance(labels.negative_anchors, dict) and not any(
            isinstance(k, Video) for k in labels.negative_anchors
        )
        else {},
        "provenance": labels.provenance,
    }


def write_labels(
    filename: str,
    labels: Labels,
    save_frame_data: bool = False,
    all_labeled: bool = False,
    suggested: bool = False,
    image_format: str = "png",
    append: bool = False,
) -> None:
    """Write a :class:`Labels` object as ``.slp``.

    With ``save_frame_data=True``, labeled frame images are embedded as
    encoded-image HDF5 datasets (training-package style) and video references
    are rewritten to point into the file itself.

    ``append=True`` merges into an existing file (reference
    ``Labels.save_hdf5(append=True)``, hdf5.py): the reference extends the
    HDF5 datasets row-wise; here the existing project is loaded, the new
    frames merged in (videos/skeletons unified by filename/node names), and
    the file rewritten — same result, no dataset surgery. These project
    files are metadata-sized, so the rewrite is cheap.
    """
    if append and os.path.exists(filename):
        base = read_labels(filename, video_search=False)
        base.extend_from(labels, unify=True)
        base_keys = {}
        for v in base.videos:
            fn = getattr(getattr(v, "backend", None), "filename", None)
            if isinstance(fn, str):
                base_keys[os.path.basename(fn)] = v
        seen = {(id(s.video), s.frame_idx) for s in base.suggestions}
        for s in labels.suggestions:
            fn = getattr(getattr(s.video, "backend", None), "filename", None)
            video = base_keys.get(os.path.basename(fn)) if isinstance(fn, str) else None
            if video is not None:
                s = SuggestionFrame(video, s.frame_idx, s.group)
            if (id(s.video), s.frame_idx) not in seen:
                base.suggestions.append(s)
        base.provenance.update(labels.provenance)
        labels = base
    mode = "w"
    videos = list(labels.videos)

    with h5py.File(filename, mode) as f:
        if save_frame_data:
            videos = _embed_frame_data(
                f, labels, image_format=image_format,
                all_labeled=all_labeled, suggested=suggested,
            )

        meta = _serialize_metadata(labels)
        md = f.require_group("metadata")
        md.attrs["format_id"] = FORMAT_ID
        md.attrs["json"] = np.bytes_(json.dumps(meta, separators=(",", ":")))

        # Videos: embedded videos point at this file via filename ".".
        videos_json = []
        for i, video in enumerate(videos):
            if isinstance(video.backend, NumpyVideo):
                # In-memory arrays would otherwise serialize as a dead
                # "numpy_video" reference; embed the raw frames so the
                # project round-trips (the reference reads it back as a
                # plain HDF5 dataset video).
                ds_name = f"video{i}_raw"
                if ds_name not in f:
                    f.create_dataset(
                        ds_name, data=video.backend._data(), compression="gzip"
                    )
                d = {
                    "backend": {
                        "type": "HDF5Video",
                        "filename": ".",
                        "dataset": ds_name,
                        "input_format": "channels_last",
                        "convert_range": False,
                    }
                }
                videos_json.append(np.bytes_(json.dumps(d, separators=(",", ":"))))
                continue
            d = video.to_dict()
            if (
                save_frame_data
                and isinstance(video.backend, HDF5Video)
                and video.backend.filename == filename
            ):
                d["backend"]["filename"] = "."
            videos_json.append(np.bytes_(json.dumps(d, separators=(",", ":"))))
        _write_json_dataset(f, "videos_json", videos_json)

        tracks_json = [
            np.bytes_(json.dumps([t.spawned_on, t.name], separators=(",", ":")))
            for t in labels.tracks
        ]
        _write_json_dataset(f, "tracks_json", tracks_json)

        video_to_idx = {id(v): i for i, v in enumerate(labels.videos)}
        suggestions_json = [
            np.bytes_(
                json.dumps(
                    {
                        "video": str(video_to_idx.get(id(s.video), 0)),
                        "frame_idx": s.frame_idx,
                        "group": s.group,
                    },
                    separators=(",", ":"),
                )
            )
            for s in labels.suggestions
            if id(s.video) in video_to_idx
        ]
        _write_json_dataset(f, "suggestions_json", suggestions_json)

        # Tables.
        skel_to_idx = {id(s): i for i, s in enumerate(labels.skeletons)}
        track_to_idx = {id(t): i for i, t in enumerate(labels.tracks)}

        all_instances: List[Instance] = []
        inst_to_id: Dict[int, int] = {}
        for lf in labels.labeled_frames:
            for inst in lf.instances:
                inst_to_id[id(inst)] = len(all_instances)
                all_instances.append(inst)

        points_list: List[np.ndarray] = []
        pred_points_list: List[np.ndarray] = []
        inst_recs = np.zeros(len(all_instances), dtype=INSTANCE_DTYPE)
        n_points = n_pred_points = 0
        for i, inst in enumerate(all_instances):
            is_pred = inst.predicted
            if is_pred:
                start = n_pred_points
                pred_points_list.append(inst.points.astype(PRED_POINT_DTYPE))
                n_pred_points += len(inst.points)
                end = n_pred_points
            else:
                start = n_points
                points_list.append(inst.points.astype(POINT_DTYPE))
                n_points += len(inst.points)
                end = n_points
            inst_recs[i] = (
                i,
                PREDICTED_INSTANCE if is_pred else USER_INSTANCE,
                0,  # patched below
                skel_to_idx.get(id(inst.skeleton), 0),
                track_to_idx.get(id(inst.track), -1) if inst.track is not None else -1,
                inst_to_id.get(id(inst.from_predicted), -1)
                if inst.from_predicted is not None
                else -1,
                getattr(inst, "score", np.nan),
                start,
                end,
                getattr(inst, "tracking_score", 0.0),
            )

        frame_recs = np.zeros(len(labels.labeled_frames), dtype=FRAME_DTYPE)
        inst_cursor = 0
        for fi, lf in enumerate(labels.labeled_frames):
            n_inst = len(lf.instances)
            frame_recs[fi] = (
                fi,
                video_to_idx.get(id(lf.video), 0),
                lf.frame_idx,
                inst_cursor,
                inst_cursor + n_inst,
            )
            inst_recs["frame_id"][inst_cursor : inst_cursor + n_inst] = fi
            inst_cursor += n_inst

        points_arr = (
            np.concatenate(points_list) if points_list else np.zeros(0, dtype=POINT_DTYPE)
        )
        pred_points_arr = (
            np.concatenate(pred_points_list)
            if pred_points_list
            else np.zeros(0, dtype=PRED_POINT_DTYPE)
        )
        for name, arr in (
            ("points", points_arr),
            ("pred_points", pred_points_arr),
            ("instances", inst_recs),
            ("frames", frame_recs),
        ):
            if name in f:
                del f[name]
            f.create_dataset(name, data=arr, dtype=arr.dtype)


def _write_json_dataset(f: h5py.File, name: str, items: List[bytes]) -> None:
    if name in f:
        del f[name]
    if items:
        f.create_dataset(name, data=items)
    else:
        f.create_dataset(name, data=np.zeros(0))


def _embed_frame_data(
    f: h5py.File,
    labels: Labels,
    image_format: str = "png",
    all_labeled: bool = False,
    suggested: bool = False,
) -> List[Video]:
    """Embed labeled-frame images, returning replacement Video objects.

    Layout matches the reference training package (video.py:1399): per video a
    group ``video{N}`` holding ``video`` (gzip, int8 rows of encoded bytes with
    ``format``/``channels``/``height``/``width`` attrs), ``frame_numbers``,
    and ``source_video`` (json attr).
    """
    import cv2

    new_videos: List[Video] = []
    suggested_by_video: Dict[int, set] = {}
    if suggested:
        for s in labels.suggestions:
            suggested_by_video.setdefault(id(s.video), set()).add(s.frame_idx)

    for v_idx, video in enumerate(labels.videos):
        frame_nums = {
            lf.frame_idx
            for lf in labels.find(video)
            if all_labeled or lf.has_user_instances
        }
        frame_nums |= suggested_by_video.get(id(video), set())
        frame_nums = sorted(frame_nums)

        encoded = []
        for fi in frame_nums:
            img = video.get_frame(fi)
            ok, buf = cv2.imencode("." + image_format, img)
            if not ok:
                raise IOError(f"Failed to encode frame {fi} of {video.filename}.")
            encoded.append(np.squeeze(buf).astype("int8"))
        max_size = max((len(e) for e in encoded), default=0)

        group = f"video{v_idx}"
        dset = f.create_dataset(
            f"{group}/video",
            (len(frame_nums), max_size),
            dtype="int8",
            compression="gzip",
        )
        dset.attrs["format"] = image_format
        dset.attrs["channels"] = video.channels
        dset.attrs["height"] = video.height
        dset.attrs["width"] = video.width
        for i, e in enumerate(encoded):
            dset[i, : len(e)] = e
        f.create_dataset(f"{group}/frame_numbers", data=np.array(frame_nums, dtype=int))
        sv = f.require_group(f"{group}/source_video")
        sv.attrs["json"] = json.dumps(video.to_dict(), separators=(",", ":"))

        new_videos.append(
            Video(
                backend=HDF5Video(
                    filename=f.filename,
                    dataset=f"{group}/video",
                    input_format="channels_last",
                    convert_range=False,
                )
            )
        )
    return new_videos
