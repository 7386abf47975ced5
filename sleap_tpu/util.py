"""Miscellaneous utilities.

Rebuild of ``/root/reference/sleap/util.py`` (json helpers, attr/dict
conversion, HDF5 dict save/load, config-dir discovery).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Hashable, Iterable, List, Optional

import attr
import h5py
import numpy as np


def json_loads(json_str: str) -> Dict:
    return json.loads(json_str)


def json_dumps(d: Dict, filename: Optional[str] = None) -> Optional[str]:
    out = json.dumps(d, separators=(",", ":"))
    if filename:
        with open(filename, "w") as f:
            f.write(out)
        return None
    return out


def attr_to_dtype(instance: Any) -> np.dtype:
    """Structured numpy dtype from an attrs class's primitive fields."""
    dtype_list = []
    for field in attr.fields(type(instance)):
        if field.type in (str, "str"):
            dtype_list.append((field.name, h5py.string_dtype()))
        elif field.type in (int, "int"):
            dtype_list.append((field.name, int))
        elif field.type in (float, "float"):
            dtype_list.append((field.name, float))
        elif field.type in (bool, "bool"):
            dtype_list.append((field.name, bool))
    return np.dtype(dtype_list)


def save_dict_to_hdf5(h5file: h5py.File, path: str, dic: dict) -> None:
    """Recursively save a dict to an HDF5 group (reference util.py)."""
    for key, item in list(dic.items()):
        if item is None:
            continue
        if isinstance(item, dict):
            save_dict_to_hdf5(h5file, f"{path}/{key}", item)
        elif isinstance(item, (list, tuple)) and item and isinstance(item[0], str):
            h5file[f"{path}/{key}"] = np.array(item, dtype=h5py.string_dtype())
        else:
            if f"{path}/{key}" in h5file:
                del h5file[f"{path}/{key}"]
            h5file[f"{path}/{key}"] = item


def read_hdf5_dataset(filename: str, dataset: str) -> np.ndarray:
    with h5py.File(filename, "r") as f:
        return f[dataset][()]


def read_hdf5_group(filename: str, group: str = "/") -> Dict[str, np.ndarray]:
    data = {}
    with h5py.File(filename, "r") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                data[f"{group.rstrip('/')}/{name}"] = obj[()]
        f[group].visititems(visit)
    return data


def weak_filename_match(filename_a: str, filename_b: str) -> bool:
    """True if two paths probably refer to the same file (reference util.py)."""
    filename_a = filename_a.replace("\\", "/").lower()
    filename_b = filename_b.replace("\\", "/").lower()
    return filename_a.split("/")[-1] == filename_b.split("/")[-1]


def dict_cut(d: Dict, a: int, b: int) -> Dict:
    """Subset of a dict with keys in [a, b)."""
    return {k: v for k, v in d.items() if a <= k < b}


def get_package_file(filename: str) -> str:
    """Path to a file bundled within the sleap_tpu package."""
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), filename)


def get_config_file(
    shortname: str, ignore_file_not_found: bool = False, get_defaults: bool = False
) -> str:
    """Locate a config file in the user dir or package defaults."""
    user_path = os.path.expanduser(f"~/.sleap_tpu/{shortname}")
    if not get_defaults and os.path.exists(user_path):
        return user_path
    pkg_path = get_package_file(f"config/{shortname}")
    if os.path.exists(pkg_path):
        return pkg_path
    if ignore_file_not_found:
        return user_path
    raise FileNotFoundError(f"Cannot find config file: {shortname}")


def make_scoped_dictionary(
    flat_dict: Dict[str, Any], exclude_nones: bool = True
) -> Dict[str, Dict[str, Any]]:
    """Convert {"scope.key": val} to {scope: {key: val}} (reference util.py)."""
    scoped: Dict[str, Dict[str, Any]] = {}
    for key, val in flat_dict.items():
        if "." in key and (not exclude_nones or val is not None):
            scope, subkey = key.split(".", 1)
            scoped.setdefault(scope, {})[subkey] = val
    return scoped


def find(f, seq: Iterable, first: bool = False):
    """Items in seq for which f returns True (or just the first)."""
    results = [x for x in seq if f(x)]
    if first:
        return results[0] if results else None
    return results


def uniquify(seq: Iterable[Hashable]) -> List:
    """Deduplicate preserving order."""
    return list(dict.fromkeys(seq))


def frame_list(frame_str: str) -> Optional[List[int]]:
    """Parse "1-10" or "1,2,3" into frame indices (reference util.py)."""
    frame_str = frame_str.strip()
    if not frame_str:
        return None
    out: List[int] = []
    for part in frame_str.split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        elif part:
            out.append(int(part))
    return out
