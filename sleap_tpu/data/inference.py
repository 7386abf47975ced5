"""Pipeline-block versions of inference stages (GUI-overlay path).

Rebuild of ``/root/reference/sleap/nn/data/inference.py`` (``KerasModelPredictor
:18``, ``GlobalPeakFinder:75``, ``MockGlobalPeakFinder:145``,
``LocalPeakFinder:204``, ``PredictedCenterInstanceNormalizer:284``). These are
the legacy composable transformer blocks the reference's GUI overlays chain to
run a model over a data pipeline; the hot inference paths here live in
``sleap_tpu.inference`` as fused jitted predictors, but the block API is kept
for parity (used with the blocks in :mod:`sleap_tpu.data.dataset_ops`).

Protocol: each block is an attrs class with ``input_keys`` / ``output_keys``
properties and ``transform_dataset(examples) -> iterator`` over example dicts
(numpy values), mirroring the reference's key-flow contract.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, List, Optional

import attr
import numpy as np


def _expand_to_rank4(arr: np.ndarray) -> tuple:
    """(H, W, C) -> (1, H, W, C); returns (batched, was_rank3)."""
    if arr.ndim == 3:
        return arr[None], True
    return arr, False


@attr.s(auto_attribs=True)
class ModelPredictor:
    """Run a trained flax model on example tensors (KerasModelPredictor:18).

    ``model`` is a :class:`sleap_tpu.inference.predictors.TrainedModel`; its
    head outputs are written under ``model_output_keys`` (matched to heads in
    order).
    """

    model: Any = None
    model_input_keys: Any = attr.ib(
        default="instance_image", converter=lambda v: [v] if isinstance(v, str) else list(v)
    )
    model_output_keys: Any = attr.ib(
        default="predicted_instance_confidence_maps",
        converter=lambda v: [v] if isinstance(v, str) else list(v),
    )

    @property
    def input_keys(self) -> List[str]:
        return list(self.model_input_keys)

    @property
    def output_keys(self) -> List[str]:
        return self.input_keys + list(self.model_output_keys)

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        import jax.numpy as jnp

        from sleap_tpu.data.normalization import ensure_float

        for ex in examples:
            imgs, was3 = _expand_to_rank4(np.asarray(ex[self.model_input_keys[0]]))
            out = self.model.module.apply(
                self.model.variables, ensure_float(jnp.asarray(imgs)), train=False
            )
            head_outputs = list(out.values())  # one entry per model head
            for i, output_key in enumerate(self.model_output_keys):
                y = np.asarray(
                    head_outputs[min(i, len(head_outputs) - 1)], dtype=np.float32
                )
                ex[output_key] = y[0] if was3 else y
            yield ex


@attr.s(auto_attribs=True)
class GlobalPeakFinder:
    """Per-channel global peaks (reference inference.py:75)."""

    confmaps_key: str = "predicted_instance_confidence_maps"
    confmaps_stride: int = 1
    peak_threshold: float = 0.2
    peaks_key: str = "predicted_center_instance_points"
    peak_vals_key: str = "predicted_center_instance_confidences"
    keep_confmaps: bool = True
    integral: bool = True
    integral_patch_size: int = 5

    @property
    def input_keys(self) -> List[str]:
        return [self.confmaps_key]

    @property
    def output_keys(self) -> List[str]:
        out = [self.peaks_key, self.peak_vals_key]
        if self.keep_confmaps:
            out.append(self.confmaps_key)
        return out

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        import jax.numpy as jnp

        from sleap_tpu.ops.peak_finding import find_global_peaks

        for ex in examples:
            cms, was3 = _expand_to_rank4(np.asarray(ex[self.confmaps_key]))
            peaks, vals = find_global_peaks(
                jnp.asarray(cms),
                threshold=self.peak_threshold,
                refinement="integral" if self.integral else None,
                integral_patch_size=self.integral_patch_size,
            )
            peaks = np.asarray(peaks) * float(self.confmaps_stride)
            vals = np.asarray(vals)
            ex[self.peaks_key] = peaks[0] if was3 else peaks
            ex[self.peak_vals_key] = vals[0] if was3 else vals
            if not self.keep_confmaps:
                ex.pop(self.confmaps_key)
            yield ex


@attr.s(auto_attribs=True)
class MockGlobalPeakFinder:
    """GT-substituting GlobalPeakFinder (reference inference.py:145): emits
    the ground-truth instance nearest the example centroid as if it were the
    model's prediction."""

    all_peaks_in_key: str = "instances"
    peaks_out_key: str = "predicted_center_instance_points"
    peak_vals_key: str = "predicted_center_instance_confidences"
    keep_confmaps: bool = True
    confmaps_in_key: str = "instance_confidence_maps"
    confmaps_out_key: str = "predicted_instance_confidence_maps"

    @property
    def input_keys(self) -> List[str]:
        keys = [self.all_peaks_in_key, "centroid", "bbox", "scale"]
        if self.keep_confmaps:
            keys.append(self.confmaps_in_key)
        return keys

    @property
    def output_keys(self) -> List[str]:
        out = [self.peaks_out_key, self.peak_vals_key]
        if self.keep_confmaps:
            out.append(self.confmaps_out_key)
        return out

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        for ex in examples:
            centroid = np.asarray(ex["centroid"], np.float64) / np.asarray(ex["scale"])
            all_peaks = np.asarray(ex[self.all_peaks_in_key], np.float64)
            dists = np.nanmin(
                np.linalg.norm(all_peaks - centroid.reshape(1, 1, 2), axis=-1), axis=1
            )
            center_instance = all_peaks[int(np.nanargmin(dists))].copy()
            bbox = np.asarray(ex["bbox"], np.float64).reshape(-1)
            center_instance -= bbox[[1, 0]].reshape(1, 2)  # (x1, y1)
            ex[self.peaks_out_key] = center_instance.astype(np.float32)
            ex[self.peak_vals_key] = np.ones(len(center_instance), np.float32)
            ex.pop(self.all_peaks_in_key)
            if self.keep_confmaps:
                ex[self.confmaps_out_key] = ex.pop(self.confmaps_in_key)
            yield ex


@attr.s(auto_attribs=True)
class LocalPeakFinder:
    """All-local-maxima finder (reference inference.py:204): emits flattened
    peak lists with sample/channel indices."""

    confmaps_key: str = "centroid_confidence_maps"
    confmaps_stride: int = 1
    peak_threshold: float = 0.2
    peaks_key: str = "predicted_centroids"
    peak_vals_key: str = "predicted_centroid_confidences"
    peak_sample_inds_key: str = "predicted_centroid_sample_inds"
    peak_channel_inds_key: str = "predicted_centroid_channel_inds"
    keep_confmaps: bool = True
    integral: bool = True
    max_peaks: int = 32

    @property
    def input_keys(self) -> List[str]:
        return [self.confmaps_key]

    @property
    def output_keys(self) -> List[str]:
        out = [
            self.peaks_key,
            self.peak_vals_key,
            self.peak_sample_inds_key,
            self.peak_channel_inds_key,
        ]
        if self.keep_confmaps:
            out.append(self.confmaps_key)
        return out

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        import jax.numpy as jnp

        from sleap_tpu.ops.peak_finding import find_local_peaks

        for ex in examples:
            cms, _ = _expand_to_rank4(np.asarray(ex[self.confmaps_key]))
            peaks, vals, mask = find_local_peaks(
                jnp.asarray(cms),
                max_peaks=self.max_peaks,
                threshold=self.peak_threshold,
                refinement="integral" if self.integral else None,
            )
            peaks = np.asarray(peaks)  # (S, C, K, 2)
            vals = np.asarray(vals)
            mask = np.asarray(mask)
            s_inds, c_inds, k_inds = np.nonzero(mask)
            ex[self.peaks_key] = (
                peaks[s_inds, c_inds, k_inds] * float(self.confmaps_stride)
            ).astype(np.float32)
            ex[self.peak_vals_key] = vals[s_inds, c_inds, k_inds].astype(np.float32)
            ex[self.peak_sample_inds_key] = s_inds.astype(np.int32)
            ex[self.peak_channel_inds_key] = c_inds.astype(np.int32)
            if not self.keep_confmaps:
                ex.pop(self.confmaps_key)
            yield ex


@attr.s(auto_attribs=True)
class PredictedCenterInstanceNormalizer:
    """Map crop-relative predicted points back to full-frame coordinates
    (reference inference.py:284)."""

    centroid_key: str = "centroid"
    centroid_confidence_key: str = "centroid_confidence"
    peaks_key: str = "predicted_center_instance_points"
    peak_confidences_key: str = "predicted_center_instance_confidences"
    new_centroid_key: str = "predicted_centroid"
    new_centroid_confidence_key: str = "predicted_centroid_confidence"
    new_peaks_key: str = "predicted_instance"
    new_peak_confidences_key: str = "predicted_instance_confidences"

    @property
    def input_keys(self) -> List[str]:
        return [
            self.centroid_key,
            self.centroid_confidence_key,
            self.peaks_key,
            self.peak_confidences_key,
            "scale",
            "bbox",
        ]

    @property
    def output_keys(self) -> List[str]:
        return [
            self.new_centroid_key,
            self.new_centroid_confidence_key,
            self.new_peaks_key,
            self.new_peak_confidences_key,
        ]

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        for ex in examples:
            scale = np.asarray(ex["scale"], np.float64)
            centroids = np.asarray(ex[self.centroid_key], np.float64) / scale
            bbox = np.asarray(ex["bbox"], np.float64).reshape(-1, 4)
            pts = np.asarray(ex[self.peaks_key], np.float64)
            pts = (pts + bbox[0, [1, 0]].reshape(1, 2)) / scale
            ex[self.new_centroid_key] = centroids.astype(np.float32)
            ex[self.new_centroid_confidence_key] = ex[self.centroid_confidence_key]
            ex[self.new_peaks_key] = pts.astype(np.float32)
            ex[self.new_peak_confidences_key] = ex[self.peak_confidences_key]
            yield ex
