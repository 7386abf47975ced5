"""Async host->device staging for the streaming inference path.

BASELINE config 4 ("fused decode/normalize/resize + predictor, 600+ FPS
streaming") maps to the reference's tf.data pipeline feeding
``Predictor._predict_generator`` (``/root/reference/sleap/nn/inference.py:
329,377-417``). The TPU-native split is:

- host thread(s): video decode + batch assembly (:mod:`sleap_tpu.data.prefetch`)
- this module: **async uint8 transfer** — ``jax.device_put`` dispatches the
  host->HBM copy without blocking, so staging batch ``i+1`` (and ``i+2``)
  overlaps the device computing batch ``i``;
- device: normalization/resize fused into the jitted forward pass
  (``_preprocess`` in :mod:`sleap_tpu.inference.predictors`), so only 1
  byte/pixel crosses the bus.

``stage_to_device`` keeps ``depth`` transfers in flight (classic double
buffering at the default ``depth=2``).
"""

from __future__ import annotations

from collections import deque
from typing import Any, Iterator, Tuple

import jax
import numpy as np


def stage_to_device(
    batches: Iterator[Tuple[dict, int]],
    depth: int = 2,
    device: Any = None,
) -> Iterator[Tuple[dict, int, jax.Array]]:
    """Yield ``(batch, n_valid, device_image)`` with transfers kept in flight.

    ``device_image`` is the batch's uint8 ``image`` already on (or on its way
    to) the device: ``jax.device_put`` is dispatched ``depth`` batches ahead
    of the consumer, so the copy engine runs while the accelerator computes.
    Normalization is deliberately NOT done here — keep it inside the jitted
    model so the transfer stays 1 byte/pixel.
    """
    if device is None:
        device = jax.devices()[0]
    in_flight: deque = deque()
    for batch, n_valid in batches:
        dev_img = jax.device_put(np.ascontiguousarray(batch["image"]), device)
        in_flight.append((batch, n_valid, dev_img))
        if len(in_flight) > depth:
            yield in_flight.popleft()
    while in_flight:
        yield in_flight.popleft()
