"""Format dispatch: extension/sniff-based import of ecosystem formats.

Rebuild of the reference's adaptor/dispatch registry
(``/root/reference/sleap/io/format/dispatch.py:16``, ``main.py:71,118``) as a
plain function registry.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from sleap_tpu.core.labels import Labels


def read(filename: str, for_object: str = "labels", as_format: Optional[str] = None, **kwargs) -> Labels:
    """Load labels from any supported format.

    Formats: ``slp`` (native), ``dlc`` / ``deeplabcut`` (CSV), ``coco``,
    ``alphatracker``, ``leap`` (.mat), ``analysis`` (.analysis.h5),
    ``nwb`` (when pynwb/ndx-pose available).
    """
    fmt = as_format or sniff_format(filename)
    if fmt == "slp":
        from sleap_tpu.io import slp

        return slp.read_labels(filename, **kwargs)
    if fmt in ("dlc", "deeplabcut", "csv_dlc"):
        from sleap_tpu.io.formats import dlc

        if filename.lower().endswith((".yaml", ".yml")):
            return dlc.read_config(filename, **kwargs)
        return dlc.read_labels(filename, **kwargs)
    if fmt == "dlc_config":
        from sleap_tpu.io.formats import dlc

        return dlc.read_config(filename, **kwargs)
    if fmt == "coco":
        from sleap_tpu.io.formats import coco

        return coco.read_labels(filename, **kwargs)
    if fmt == "alphatracker":
        from sleap_tpu.io.formats import alphatracker

        return alphatracker.read_labels(filename, **kwargs)
    if fmt in ("leap", "mat"):
        from sleap_tpu.io.formats import leap_matlab

        return leap_matlab.read_labels(filename, **kwargs)
    if fmt == "analysis":
        from sleap_tpu.io.formats import sleap_analysis

        return sleap_analysis.read_labels(filename, **kwargs)
    if fmt in ("labels_json", "json"):
        from sleap_tpu.io.formats import labels_json

        return labels_json.read_labels(filename, **kwargs)
    if fmt == "nwb":
        from sleap_tpu.io.formats import ndx_pose

        return ndx_pose.read_labels(filename, **kwargs)
    if fmt == "nix":
        raise ValueError(
            "The NIX adaptor is write-only (reference nix.py:75); use "
            "Labels.export_nix() to write."
        )
    if fmt == "genericjson":
        return read_json(filename)
    if fmt in ("text", "txt"):
        return read_text(filename)
    raise ValueError(f"Cannot detect format for {filename!r} (got {fmt!r}).")


def read_json(filename: str) -> dict:
    """Read any generic JSON file (reference format/genericjson.py:13)."""
    with open(filename) as f:
        return json.load(f)


def write_json(filename: str, source_object) -> None:
    """Write a dict as JSON (reference GenericJsonAdaptor.write)."""
    with open(filename, "w") as f:
        json.dump(source_object, f, separators=(",", ":"))


def read_text(filename: str) -> str:
    """Read any text file (reference format/text.py:11)."""
    with open(filename) as f:
        return f.read()


def write_text(filename: str, source_object: str) -> None:
    """Write a string to a text file (reference TextAdaptor.write)."""
    with open(filename, "w") as f:
        f.write(source_object)


def sniff_format(filename: str) -> str:
    low = filename.lower()
    if low.endswith(".slp") or low.endswith(".pkg.slp"):
        return "slp"
    if low.endswith(".analysis.h5"):
        return "analysis"
    if low.endswith((".h5", ".hdf5")):
        # Distinguish .slp-layout files from analysis files by content.
        import h5py

        with h5py.File(filename, "r") as f:
            if "metadata" in f and "frames" in f:
                return "slp"
            if "track_occupancy" in f:
                return "analysis"
        return "slp"
    if low.endswith(".mat"):
        return "leap"
    if low.endswith(".csv"):
        with open(filename) as f:
            first = f.readline()
        if first.startswith("scorer"):
            return "dlc"
        return "csv"
    if low.endswith(".json"):
        with open(filename) as f:
            head = f.read(4096)
        if '"categories"' in head or '"annotations"' in head and '"images"' in head:
            return "coco"
        if '"class"' in head and '"annotations"' in head:
            return "alphatracker"
        if '"labels"' in head or '"skeletons"' in head:
            return "labels_json"
        return "genericjson"
    if low.endswith(".nwb"):
        return "nwb"
    if low.endswith(".nix"):
        return "nix"
    if low.endswith((".txt", ".log")):
        return "text"
    if low.endswith((".yaml", ".yml")):
        with open(filename) as f:
            head = f.read(8192)
        if "bodyparts" in head or "multianimalproject" in head:
            return "dlc_config"
    raise ValueError(f"Unknown file format: {filename}")
