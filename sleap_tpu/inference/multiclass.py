"""Multiclass (supervised-ID) predictors.

Rebuild of ``/root/reference/sleap/nn/inference.py``
(``BottomUpMultiClassInferenceLayer:3351`` + ``Predictor:3638``,
``TopDownMultiClassFindPeaks:3863`` + ``Predictor:4213``). Identities are
predicted directly by the model (class maps or class vectors) and become
:class:`~sleap_tpu.core.instance.Track` objects named after the classes
(inference.py:3758-3860).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import attr
import jax
import jax.numpy as jnp
import numpy as np

from sleap_tpu.core.instance import LabeledFrame, PredictedInstance, Track
from sleap_tpu.data.normalization import ensure_float
from sleap_tpu.data.providers import batch_examples
from sleap_tpu.data.prefetch import prefetch
from sleap_tpu.data.streaming import stage_to_device
from sleap_tpu.data.resizing import resize_image
from sleap_tpu.inference.predictors import (
    Predictor,
    TrainedModel,
    _adjust_peaks,
    _cast_like,
    _can_defer_float,
    _preprocess,
    _skeleton_from_config,
    load_trained_model,
)
from sleap_tpu.models.model import find_head
from sleap_tpu.ops.identity import classify_peaks_from_maps, classify_peaks_from_vectors
from sleap_tpu.ops.peak_finding import (
    crop_bboxes_unit,
    find_global_peaks,
    find_global_peaks_with_offsets,
    find_local_peaks,
    find_local_peaks_with_offsets,
)


class _MultiClassBuilderMixin:
    """Shared labeled-frame builder: classes -> Tracks."""

    def _class_tracks(self, classes):
        return [Track(spawned_on=0, name=name) for name in classes]

    def _build_frames(self, generator, provider, skeleton, classes, score_mode):
        tracks = self._class_tracks(classes)
        frames = []
        for ex in generator:
            for i in range(ex["n_valid"]):
                instances = []
                for ci in range(len(classes)):
                    pts = ex["points"][i, ci]
                    if np.all(np.isnan(pts)):
                        continue
                    confs = ex["point_vals"][i, ci]
                    probs = ex["class_probs"][i, ci]
                    if score_mode == "centroid":
                        inst_score = float(ex["centroid_vals"][i, ci]) if "centroid_vals" in ex else float(np.nanmean(confs))
                    else:
                        inst_score = float(np.nanmean(confs))
                    instances.append(
                        PredictedInstance.from_arrays(
                            points=pts,
                            point_confidences=np.nan_to_num(confs),
                            instance_score=inst_score,
                            skeleton=skeleton,
                            track=tracks[ci],
                            tracking_score=float(np.nanmean(probs)),
                        )
                    )
                frames.append(
                    LabeledFrame(
                        video=provider.videos[int(ex["video_ind"][i])],
                        frame_idx=int(ex["frame_ind"][i]),
                        instances=instances,
                    )
                )
        return frames


@attr.s(auto_attribs=True)
class BottomUpMultiClassPredictor(Predictor, _MultiClassBuilderMixin):
    """Confmaps + class maps -> identity-grouped instances."""

    model: Optional[TrainedModel] = None
    peak_threshold: float = 0.2
    integral_refinement: bool = True
    integral_patch_size: int = 5
    batch_size: int = 4
    max_peaks_per_node: int = 8
    tracker: Any = None

    _infer_fn: Any = attr.ib(default=None, init=False, repr=False)

    @classmethod
    def from_trained_models(cls, model_path: str, **kwargs) -> "BottomUpMultiClassPredictor":
        kwargs.pop("max_instances", None)
        return cls(model=load_trained_model(model_path), **kwargs)

    @property
    def config(self):
        return self.model.config

    @property
    def classes(self):
        return self.config.model.heads.multi_class_bottomup.class_maps.classes

    def _build_infer_fn(self):
        tm = self.model
        heads = self.config.model.heads.multi_class_bottomup
        cm_stride = heads.confmaps.output_stride
        classmap_stride = heads.class_maps.output_stride
        input_scale = tm.input_scale
        pad = self.config.data.preprocessing.pad_to_stride or tm.model.maximum_stride
        threshold = self.peak_threshold
        refinement = "integral" if self.integral_refinement else "local"
        K = self.max_peaks_per_node

        @jax.jit
        def infer(images):
            imgs = _preprocess(
                images, tm.grayscale, input_scale, pad,
                imagenet_mode=tm.imagenet_mode,
                defer_float=_can_defer_float(tm),
            )
            out = tm.module.apply(tm.variables, imgs, train=False)
            cms = out[find_head(out, "MultiInstanceConfmapsHead")]
            class_maps = out[find_head(out, "ClassMapsHead")]
            off_key = find_head(out, "OffsetRefinementHead")
            if off_key is not None:
                peaks, vals, mask = find_local_peaks_with_offsets(
                    cms, out[off_key], max_peaks=K, threshold=threshold
                )
            else:
                peaks, vals, mask = find_local_peaks(
                    cms, max_peaks=K, threshold=threshold,
                    refinement=refinement, integral_patch_size=self.integral_patch_size,
                )
            peaks = peaks * float(cm_stride)  # model-input scale
            points, point_vals, class_probs = classify_peaks_from_maps(
                class_maps, peaks, vals, mask, class_maps_stride=classmap_stride
            )
            points = _adjust_peaks(points, 1, input_scale)  # /scale + 0.5
            return {
                "points": points,
                "point_vals": point_vals,
                "class_probs": class_probs,
            }

        return infer

    def _predict_generator(self, provider):
        if self._infer_fn is None:
            self._infer_fn = self._build_infer_fn()
        total, done, t0 = len(provider), 0, time.time()
        for batch, n_valid, dev_img in stage_to_device(
            prefetch(batch_examples(provider, self.batch_size))
        ):
            out = self._infer_fn(dev_img)
            ex = {k: np.asarray(v) for k, v in out.items()}
            ex.update(
                image=batch["image"], video_ind=batch["video_ind"],
                frame_ind=batch["frame_ind"], n_valid=n_valid,
            )
            done += n_valid
            if self.verbosity != "none":
                self._report_progress(done, total, t0)
            yield ex

    def _make_labeled_frames_from_generator(self, generator, provider):
        skeleton = _skeleton_from_config(self.config)
        return self._build_frames(
            generator, provider, skeleton, self.classes, score_mode="mean"
        )


@attr.s(auto_attribs=True)
class TopDownMultiClassPredictor(Predictor, _MultiClassBuilderMixin):
    """Centroid crops -> confmaps + class vectors -> identity instances."""

    centroid_model: Optional[TrainedModel] = None
    confmap_model: Optional[TrainedModel] = None
    peak_threshold: float = 0.2
    integral_refinement: bool = True
    integral_patch_size: int = 5
    batch_size: int = 4
    max_instances: Optional[int] = None
    tracker: Any = None

    _infer_fn: Any = attr.ib(default=None, init=False, repr=False)

    @classmethod
    def from_trained_models(
        cls,
        centroid_model_path: Optional[str] = None,
        confmap_model_path: Optional[str] = None,
        **kwargs,
    ) -> "TopDownMultiClassPredictor":
        return cls(
            centroid_model=load_trained_model(centroid_model_path)
            if centroid_model_path
            else None,
            confmap_model=load_trained_model(confmap_model_path)
            if confmap_model_path
            else None,
            **kwargs,
        )

    @property
    def confmap_config(self):
        return self.confmap_model.config

    @property
    def centroid_config(self):
        return self.centroid_model.config if self.centroid_model else None

    @property
    def classes(self):
        return self.confmap_config.model.heads.multi_class_topdown.class_vectors.classes

    @property
    def _max_peaks(self) -> int:
        return self.max_instances or max(len(self.classes), 2)

    def _crop_size(self) -> int:
        size = self.confmap_config.data.instance_cropping.crop_size
        return int(size) if size else 128

    def _build_infer_fn(self):
        K = self._max_peaks
        crop_size = self._crop_size()
        threshold = self.peak_threshold
        refinement = "integral" if self.integral_refinement else "local"
        patch = self.integral_patch_size
        itm = self.confmap_model
        heads = self.confmap_config.model.heads.multi_class_topdown
        i_stride = heads.confmaps.output_stride
        i_scale = itm.input_scale
        precrop_resize = i_scale
        ctm = self.centroid_model
        if ctm is not None:
            c_stride = self.centroid_config.model.heads.centroid.output_stride
            c_scale = ctm.input_scale
            c_pad = (
                self.centroid_config.data.preprocessing.pad_to_stride
                or ctm.model.maximum_stride
            )

        def stage23(images, centroids, centroid_mask, centroid_vals):
            full = images
            if precrop_resize != 1.0:
                full = resize_image(ensure_float(full), precrop_resize)
                centroids_c = centroids * precrop_resize
            else:
                centroids_c = centroids
            crop_offsets = centroids_c - (crop_size / 2.0)
            S = images.shape[0]
            flat_centroids = jnp.nan_to_num(centroids_c.reshape(S * K, 2))
            top_left = flat_centroids - (crop_size - 1) / 2.0
            sample_inds = jnp.repeat(jnp.arange(S), K)
            crops = crop_bboxes_unit(full, top_left, sample_inds, (crop_size, crop_size))
            crops = _cast_like(crops, full.dtype)
            crops_p = _preprocess(
                crops, itm.grayscale, i_scale, 1, resize_img=False,
                imagenet_mode=itm.imagenet_mode,
                defer_float=_can_defer_float(itm),
            )
            out2 = itm.module.apply(itm.variables, crops_p, train=False)
            cms2 = out2[find_head(out2, "CenteredInstanceConfmapsHead")]
            class_vecs = out2[find_head(out2, "ClassVectorsHead")]  # (S*K, n_classes)
            off2 = find_head(out2, "OffsetRefinementHead")
            if off2 is not None:
                pk, pv = find_global_peaks_with_offsets(
                    cms2, out2[off2], threshold=threshold
                )
            else:
                pk, pv = find_global_peaks(
                    cms2, threshold=threshold, refinement=refinement,
                    integral_patch_size=patch,
                )
            pk = _adjust_peaks(pk, i_stride, i_scale)
            pk = pk + (crop_offsets.reshape(S * K, 2) / i_scale)[:, None, :]
            C = pk.shape[1]
            pk = pk.reshape(S, K, C, 2)
            pv = pv.reshape(S, K, C)
            n_classes = class_vecs.shape[-1]
            class_vecs = class_vecs.reshape(S, K, n_classes)
            points, point_vals, class_probs = classify_peaks_from_vectors(
                pk, pv, class_vecs, centroid_mask
            )
            return {
                "points": points,
                "point_vals": point_vals,
                "class_probs": class_probs,
            }

        if ctm is None:
            @jax.jit
            def infer(images, centroids, centroid_mask):
                return stage23(
                    images, centroids, centroid_mask, jnp.ones(centroid_mask.shape)
                )

            return infer

        @jax.jit
        def infer(images):
            imgs = _preprocess(
                images, ctm.grayscale, c_scale, c_pad,
                imagenet_mode=ctm.imagenet_mode,
                defer_float=_can_defer_float(ctm),
            )
            out = ctm.module.apply(ctm.variables, imgs, train=False)
            cms = out[find_head(out, "CentroidConfmapsHead")]
            off_key = find_head(out, "OffsetRefinementHead")
            if off_key is not None:
                peaks, vals, mask = find_local_peaks_with_offsets(
                    cms, out[off_key], max_peaks=K, threshold=threshold
                )
            else:
                peaks, vals, mask = find_local_peaks(
                    cms, max_peaks=K, threshold=threshold,
                    refinement=refinement, integral_patch_size=patch,
                )
            centroids = _adjust_peaks(peaks[:, 0], c_stride, c_scale)
            return stage23(images, centroids, mask[:, 0], vals[:, 0])

        return infer

    def _gt_centroid_batches(self, provider):
        from sleap_tpu.data.instance_centroids import get_instance_centroids

        anchor_ind = None
        anchor = self.confmap_config.data.instance_cropping.center_on_part
        skeleton = _skeleton_from_config(self.confmap_config)
        if anchor and anchor in skeleton.node_names:
            anchor_ind = skeleton.node_names.index(anchor)
        K = self._max_peaks
        buf = []

        def emit(buf):
            n_valid = len(buf)
            while len(buf) < self.batch_size:
                buf.append(buf[-1])
            return (
                {
                    "image": np.stack([e["image"] for e in buf]),
                    "video_ind": np.array([e["video_ind"] for e in buf]),
                    "frame_ind": np.array([e["frame_ind"] for e in buf]),
                    "centroids": np.stack([e["centroids"] for e in buf]).astype("f4"),
                    "centroid_mask": np.stack([e["centroid_mask"] for e in buf]),
                },
                n_valid,
            )

        for ex in provider:
            cents = get_instance_centroids(
                ex.get("instances", np.zeros((0, 0, 2))), anchor_ind
            )[:K]
            padded = np.full((K, 2), np.nan)
            padded[: len(cents)] = cents
            mask = np.zeros(K, bool)
            mask[: len(cents)] = ~np.isnan(cents).any(axis=-1)
            ex = dict(ex)
            ex["centroids"] = padded
            ex["centroid_mask"] = mask
            buf.append(ex)
            if len(buf) == self.batch_size:
                yield emit(buf)
                buf = []
        if buf:
            yield emit(buf)

    def _predict_generator(self, provider):
        if self._infer_fn is None:
            self._infer_fn = self._build_infer_fn()
        total, done, t0 = len(provider), 0, time.time()
        gt_mode = self.centroid_model is None
        batches = (
            self._gt_centroid_batches(provider)
            if gt_mode
            else batch_examples(provider, self.batch_size)
        )
        for batch, n_valid, dev_img in stage_to_device(prefetch(batches)):
            if gt_mode:
                out = self._infer_fn(
                    dev_img,
                    jnp.asarray(batch["centroids"]),
                    jnp.asarray(batch["centroid_mask"]),
                )
            else:
                out = self._infer_fn(dev_img)
            ex = {k: np.asarray(v) for k, v in out.items()}
            ex.update(
                image=batch["image"], video_ind=batch["video_ind"],
                frame_ind=batch["frame_ind"], n_valid=n_valid,
            )
            done += n_valid
            if self.verbosity != "none":
                self._report_progress(done, total, t0)
            yield ex

    def _make_labeled_frames_from_generator(self, generator, provider):
        skeleton = _skeleton_from_config(self.confmap_config)
        return self._build_frames(
            generator, provider, skeleton, self.classes, score_mode="mean"
        )
