"""Load reference Keras ``.h5`` checkpoints into flax PoseNet variables.

The reference ships trained models as Keras HDF5 weight files
(``best_model.h5`` in each run folder; layer naming from
``/root/reference/sleap/nn/architectures/encoder_decoder.py`` prefixes and
``heads.py`` head names). Our flax modules use the same layer names modulo
three cosmetic differences, handled here:

- decoder blocks carry a ``_s{in}_to_s{out}`` stride infix in Keras;
- UNet middle blocks carry ``_middle_expand`` / ``_middle_contract`` infixes;
- head layers get a Keras uniquing suffix (``CentroidConfmapsHead_0``).

Weight layout conversions:
- Conv2D kernels are (kh, kw, in, out) in both frameworks — copied directly.
- Conv2DTranspose kernels are (kh, kw, out, in) in Keras; flax
  ``nn.ConvTranspose`` wants (kh, kw, in, out) and computes a fractionally
  strided conv, which equals Keras's gradient-based transposed conv when the
  kernel is additionally flipped along both spatial axes.
- BatchNorm gamma/beta -> scale/bias; moving stats -> batch_stats.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import h5py
import numpy as np

_STRIDE_INFIX = re.compile(r"_s\d+_to_s\d+")
_MIDDLE_INFIX = re.compile(r"_middle_(expand|contract)")
_HEAD_SUFFIX = re.compile(r"^(?P<head>[A-Za-z]+Head)_\d+$")


def _canonical(layer_name: str) -> str:
    """Normalize a Keras layer name to our flax layer naming."""
    name = _STRIDE_INFIX.sub("", layer_name)
    name = _MIDDLE_INFIX.sub("", name)
    m = _HEAD_SUFFIX.match(name)
    if m:
        name = m.group("head")
    return name


def read_keras_weights(h5_path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Read {canonical_layer_name: {weight_name: array}} from a Keras h5."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    with h5py.File(h5_path, "r") as f:
        grp = f["model_weights"] if "model_weights" in f else f
        layer_names = [n.decode() if isinstance(n, bytes) else n for n in grp.attrs.get("layer_names", [])]
        if not layer_names:
            layer_names = list(grp.keys())
        for lname in layer_names:
            if lname not in grp:
                continue
            weights: Dict[str, np.ndarray] = {}

            def visit(name, obj, weights=weights):
                if isinstance(obj, h5py.Dataset):
                    weights[name.split("/")[-1].split(":")[0]] = obj[:]

            grp[lname].visititems(visit)
            if weights:
                out[_canonical(lname)] = weights
    return out


def load_keras_weights_into_variables(h5_path: str, variables: Any) -> Any:
    """Fill a flax variables pytree with weights from a Keras h5 file.

    Args:
        h5_path: path to ``best_model.h5`` (or similar) from the reference.
        variables: the flax variables dict from ``module.init`` — used as the
            structural template (shapes validated).

    Returns:
        A new variables dict with params (and batch_stats, if present)
        replaced by the Keras weights.

    Raises:
        KeyError / ValueError on unmatched layers or shape mismatches — a
        loud failure is preferred over silently mixed weights.
    """
    import flax

    keras = read_keras_weights(h5_path)
    flat = flax.traverse_util.flatten_dict(variables)
    new_flat = {}
    used = set()
    for path, value in flat.items():
        collection = path[0]  # "params" or "batch_stats"
        layer_path = [p for p in path[1:-1]]
        param_name = path[-1]
        # Layer name is the last module-path element; drop the "backbone"
        # wrapper scope.
        layer_name = layer_path[-1] if layer_path else ""
        if layer_name not in keras:
            raise KeyError(
                f"No Keras weights for layer {layer_name!r} (path {path})."
            )
        weights = keras[layer_name]
        is_trans_conv = "trans_conv" in layer_name and param_name in ("kernel",)
        if collection == "params":
            if param_name == "kernel":
                w = weights["kernel"]
                if is_trans_conv:
                    # Keras (kh, kw, out, in) -> flax (kh, kw, in, out), plus
                    # spatial flip to convert gradient-of-conv semantics into
                    # a fractionally strided conv.
                    w = np.transpose(w, (0, 1, 3, 2))[::-1, ::-1]
                new_flat[path] = _check(w, value, path)
                used.add((layer_name, "kernel"))
            elif param_name == "bias":
                key = "bias" if "bias" in weights else "beta"
                new_flat[path] = _check(weights[key], value, path)
                used.add((layer_name, key))
            elif param_name == "scale":
                new_flat[path] = _check(weights["gamma"], value, path)
                used.add((layer_name, "gamma"))
            else:
                raise KeyError(f"Unhandled param {param_name!r} at {path}.")
        elif collection == "batch_stats":
            if param_name == "mean":
                new_flat[path] = _check(weights["moving_mean"], value, path)
                used.add((layer_name, "moving_mean"))
            elif param_name == "var":
                new_flat[path] = _check(weights["moving_variance"], value, path)
                used.add((layer_name, "moving_variance"))
            else:
                raise KeyError(f"Unhandled batch stat {param_name!r} at {path}.")
        else:
            new_flat[path] = value
    return flax.traverse_util.unflatten_dict(new_flat)


def _check(w: np.ndarray, template: Any, path: Tuple) -> np.ndarray:
    if tuple(w.shape) != tuple(template.shape):
        raise ValueError(
            f"Shape mismatch at {path}: keras {w.shape} vs flax {template.shape}."
        )
    return w.astype(np.asarray(template).dtype)
