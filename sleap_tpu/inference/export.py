"""Model export for deployment.

Rebuild of the reference's frozen-graph export
(``/root/reference/sleap/nn/inference.py:1092-1171`` and ``sleap-export`` at
:5050): the TPU-native equivalent serializes the full jitted inference
computation as StableHLO via ``jax.export`` (portable across JAX versions and
loadable from C++/IFRT runtimes), alongside an ``info.json`` describing the
I/O signature.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def export_model(
    model_path: Union[str, Sequence[str]],
    save_path: str = "exported_model",
    batch_size: int = 4,
    image_size: Optional[int] = None,
    max_instances: Optional[int] = None,
    **kwargs,
) -> str:
    """Export trained model(s) as a serialized StableHLO inference function.

    Writes ``<save_path>/model.stablehlo`` (serialized ``jax.export``
    artifact) and ``<save_path>/info.json``.
    """
    from jax import export as jax_export

    from sleap_tpu.inference.predictors import Predictor

    predictor = Predictor.from_model_paths(
        model_path, batch_size=batch_size, max_instances=max_instances, **kwargs
    )
    if image_size is None:
        image_size = 1024
    return export_predictor(
        predictor,
        save_path,
        image_size=image_size,
        model_paths=[model_path] if isinstance(model_path, str) else list(model_path),
    )


def export_predictor(
    predictor,
    save_path: str = "exported_model",
    image_size: int = 1024,
    model_paths: Optional[Sequence[str]] = None,
) -> str:
    """Export a live predictor's fused inference fn as serialized StableHLO."""
    from jax import export as jax_export

    infer_fn = predictor._build_infer_fn()
    channels = 1
    for attr_name in ("confmap_model", "centroid_model", "bottomup_model", "model"):
        tm = getattr(predictor, attr_name, None)
        if tm is not None:
            channels = tm.input_channels
            break
    batch_size = predictor.batch_size
    x_spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, channels), jnp.uint8)
    exported = jax_export.export(jax.jit(infer_fn))(x_spec)
    blob = exported.serialize()

    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, "model.stablehlo"), "wb") as f:
        f.write(blob)
    info = {
        "predictor": type(predictor).__name__,
        "model_paths": list(model_paths or []),
        "input_shape": [batch_size, image_size, image_size, channels],
        "input_dtype": "uint8",
        "outputs": "dict of NaN-padded arrays (instance_peaks, instance_peak_vals, ...)",
        "format": "jax.export serialized StableHLO",
    }
    with open(os.path.join(save_path, "info.json"), "w") as f:
        json.dump(info, f, indent=2)
    return save_path


def load_exported_model(save_path: str):
    """Deserialize an exported model; returns a callable."""
    from jax import export as jax_export

    with open(os.path.join(save_path, "model.stablehlo"), "rb") as f:
        blob = f.read()
    exported = jax_export.deserialize(blob)
    return exported.call
