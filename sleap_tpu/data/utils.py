"""Small data-utility helpers.

Rebuild of ``/root/reference/sleap/nn/data/utils.py`` (``ensure_list:9``,
``expand_to_rank:16``, ``describe_tensors:87``). Grid/PDF helpers live in
:mod:`sleap_tpu.ops.grid`; ragged-tensor helpers have no equivalent because
every sleap-tpu pipeline tensor is statically shaped (masked, not ragged).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


def ensure_list(x: Any) -> List[Any]:
    """Wrap ``x`` in a list if it isn't one already."""
    return x if isinstance(x, list) else [x]


def expand_to_rank(x, target_rank: int, prepend: bool = True):
    """Expand an array to ``target_rank`` by adding singleton dims.

    Args:
        x: numpy or JAX array (anything with ``.ndim`` / ``.reshape``).
        target_rank: desired rank; if ``x.ndim`` already >= this, returned
            unchanged (matching the reference's behavior).
        prepend: add the new axes at the front (True) or the back.
    """
    n_new = int(target_rank) - x.ndim
    if n_new <= 0:
        return x
    new_shape = (
        (1,) * n_new + tuple(x.shape) if prepend else tuple(x.shape) + (1,) * n_new
    )
    return x.reshape(new_shape)


def describe_tensors(
    example: Dict[str, Any], return_description: bool = False
) -> Optional[str]:
    """Print (or return) a table describing each tensor in an example dict.

    Mirrors the reference's debugging helper: one line per key with type,
    shape, dtype and device.
    """
    key_length = max(len(k) for k in example)
    lines = []
    for key, val in example.items():
        dtype = getattr(val, "dtype", type(val).__name__)
        dtype = str(dtype) if isinstance(dtype, np.dtype) else repr(dtype)
        shape = getattr(val, "shape", "N/A")
        device = getattr(val, "device", "N/A")
        if callable(device):  # jax.Array.device is a method
            try:
                device = device()
            except TypeError:
                device = "N/A"
        lines.append(
            f"{key.rjust(key_length)}: type={type(val).__name__}, "
            f"shape={shape}, dtype={dtype}, device={device}"
        )
    desc = "\n".join(lines)
    if return_description:
        return desc
    print(desc)
    return None
