"""Shared model-building types.

Reference analog: ``/root/reference/sleap/nn/architectures/common.py:8``
(``IntermediateFeature``).
"""

from __future__ import annotations

from typing import Any, NamedTuple


class IntermediateFeature(NamedTuple):
    """An activation tensor tagged with its stride relative to the input."""

    tensor: Any
    stride: int
