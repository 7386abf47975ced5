"""DeepLabCut format importer.

Rebuild of ``/root/reference/sleap/io/format/deeplabcut.py`` (347 LoC):
reads single-animal and multi-animal (``individuals`` header row) DLC
CollectedData CSVs into :class:`Labels`, with images referenced from the
CSV's index column. Multi-animal "single" (unique) body parts become
untracked instances, named individuals become Tracks.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from sleap_tpu.core.instance import Instance, LabeledFrame, Track
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video


def _resolve_image(path: str, base_dir: str) -> str:
    candidates = [path, os.path.join(base_dir, os.path.basename(path))]
    anc = base_dir
    for _ in range(4):
        candidates.append(os.path.join(anc, path))
        anc = os.path.dirname(anc)
    for cand in candidates:
        if os.path.exists(cand):
            return cand
    return path


def read_config(filename: str) -> Labels:
    """Load a DLC PROJECT from its ``config.yaml`` (reference
    deeplabcut.py:270-340): build the skeleton from the config's body-part
    lists, then import every ``labeled-data/*/CollectedData*.csv`` under the
    project root against that shared skeleton.
    """
    import glob

    import yaml

    with open(filename) as f:
        project = yaml.safe_load(f)

    skeleton = Skeleton(name="deeplabcut")
    if project.get("multianimalproject", False):
        skeleton.add_nodes(project.get("multianimalbodyparts", []))
        for name in project.get("uniquebodyparts", []) or []:
            skeleton.add_node(name)
    else:
        skeleton.add_nodes(project.get("bodyparts", []))

    root_dir = os.path.dirname(os.path.abspath(filename))
    labeled_dir = os.path.join(root_dir, "labeled-data")
    merged: Optional[Labels] = None
    for subdir in sorted(glob.glob(os.path.join(labeled_dir, "*"))):
        if not os.path.isdir(subdir):
            continue
        csvs = sorted(glob.glob(os.path.join(subdir, "CollectedData*.csv")))
        if not csvs:
            continue
        labels = read_labels(csvs[0], skeleton=skeleton)
        if merged is None:
            merged = labels
        else:
            merged.extend_from(labels)
    if merged is None:
        return Labels(labeled_frames=[], skeletons=[skeleton])
    return merged


def read_labels(filename: str, skeleton: Optional[Skeleton] = None) -> Labels:
    """Load a DLC CollectedData CSV (single- or multi-animal)."""
    import csv as csv_mod

    # Parse manually: DLC header rows can be ragged (the scorer row is often
    # shorter than the data rows in multi-animal files).
    with open(filename) as f:
        rows = list(csv_mod.reader(f))
    header_names = [r[0].strip() for r in rows[:4]]
    has_individuals = "individuals" in header_names
    n_header = 4 if has_individuals else 3
    headers = rows[:n_header]
    data_rows = rows[n_header:]
    n_cols = max(len(r) for r in data_rows) - 1

    def header_row(label):
        for r in headers:
            if r[0].strip() == label:
                return [
                    (r[i + 1] if i + 1 < len(r) else "") for i in range(n_cols)
                ]
        return [""] * n_cols

    inds_row = header_row("individuals") if has_individuals else [None] * n_cols
    parts_row = header_row("bodyparts")
    coords_row = header_row("coords")
    # v2 layout splits the image path over the first columns (blank header
    # cells); detect by leading empty bodyparts entries.
    n_index = 1
    while n_index <= len(parts_row) and parts_row[n_index - 1] == "":
        n_index += 1
    if n_index > 1:
        inds_row = inds_row[n_index - 1 :]
        parts_row = parts_row[n_index - 1 :]
        coords_row = coords_row[n_index - 1 :]
    columns = list(zip(inds_row, parts_row, coords_row))

    df_index = [os.path.join(*r[:n_index]) for r in data_rows]
    df_data = []
    for r in data_rows:
        vals = {}
        for i, col in enumerate(columns):
            raw = r[i + n_index] if i + n_index < len(r) else ""
            vals[col] = float(raw) if raw not in ("", None) else np.nan
        df_data.append(vals)

    base_dir = os.path.dirname(os.path.abspath(filename))

    def col_individual(col):
        return col[0] if has_individuals else None

    def col_part(col):
        return col[1]

    def col_coord(col):
        return col[2]

    individuals = list(dict.fromkeys(col_individual(c) for c in columns))
    node_names = list(dict.fromkeys(col_part(c) for c in columns))

    if skeleton is None:
        skeleton = Skeleton(name="deeplabcut")
        skeleton.add_nodes(node_names)
    else:
        for name in node_names:
            if not skeleton.has_node(name):
                skeleton.add_node(name)

    # Tracks are created lazily at the first frame where the individual has
    # any visible point, so ``spawned_on`` records that frame index — the
    # reference gives the multi-animal "single" (unique-bodyparts) pseudo-
    # individual its own track this way (tests/io/test_formats.py:310-320).
    tracks: dict = {}

    def track_for(ind, frame_idx):
        if ind is None:
            return None
        if ind not in tracks:
            tracks[ind] = Track(spawned_on=frame_idx, name=str(ind))
        return tracks[ind]

    # Map (individual, part, coord) -> column for fast row access.
    col_map = {
        (col_individual(c), col_part(c), str(col_coord(c))): c for c in columns
    }

    img_paths = [_resolve_image(str(idx), base_dir) for idx in df_index]
    video = Video.from_image_filenames(img_paths)

    lfs = []
    for row_i, row in enumerate(df_data):
        instances = []
        for ind in individuals:
            pts = np.full((skeleton.n_nodes, 2), np.nan)
            visible = False
            for ni, part in enumerate(skeleton.node_names):
                for ci, coord in enumerate(("x", "y")):
                    col = col_map.get((ind, part, coord))
                    if col is None:
                        continue
                    val = row.get(col, np.nan)
                    if not np.isnan(val):
                        pts[ni, ci] = float(val)
                        visible = True
            if visible:
                instances.append(
                    Instance(
                        skeleton=skeleton,
                        points=pts,
                        track=track_for(ind, row_i),
                    )
                )
        if instances:
            lfs.append(LabeledFrame(video=video, frame_idx=row_i, instances=instances))

    return Labels(
        labeled_frames=lfs,
        videos=[video],
        skeletons=[skeleton],
        tracks=list(tracks.values()),
    )
