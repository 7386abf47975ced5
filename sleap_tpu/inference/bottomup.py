"""Bottom-up predictor: multi-peak confmaps + PAF grouping.

Rebuild of ``/root/reference/sleap/nn/inference.py``
(``BottomUpInferenceLayer:2737``, ``BottomUpPredictor:3056``). The network
forward pass, local peak finding, PAF line scoring, Hungarian matching, AND
greedy instance assembly (masked fixed-iteration scan) all run in one jitted
computation (see :mod:`sleap_tpu.ops.paf_grouping`); the host only unpacks
the fixed-size NaN-padded outputs.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Iterator, List, Optional

import attr
import jax
import jax.numpy as jnp
import numpy as np

from sleap_tpu.core.instance import LabeledFrame, PredictedInstance
from sleap_tpu.data.providers import batch_examples
from sleap_tpu.data.prefetch import prefetch
from sleap_tpu.data.streaming import stage_to_device
from sleap_tpu.inference.predictors import (
    Predictor,
    TrainedModel,
    _adjust_peaks,
    _attach_tracker,
    _can_defer_float,
    _preprocess,
    _skeleton_from_config,
    load_trained_model,
)
from sleap_tpu.models.model import find_head
from sleap_tpu.ops.paf_grouping import PAFScorer, match_candidates_batch, score_paf_lines_batch
from sleap_tpu.ops.peak_finding import find_local_peaks, find_local_peaks_with_offsets

# Optional TPU layout experiment: emit the confmap head channels-first so the
# peak finder skips the NHWC->NCHW relayout (see _build_infer_fn). Measured on
# the v5e at the bench config (batch 256 @1024²): 1510 FPS vs 1620 with the
# plain NHWC head — the einsum head forfeits XLA's fusion of the 1x1 head conv
# with the preceding refine conv, which outweighs the saved relayout. Default
# OFF; kept because the equivalence is tested and other model shapes may
# rank differently (isolated microbenchmarks showed +19% for the einsum).
CHANNELS_FIRST_CONFMAPS = False


@attr.s(auto_attribs=True)
class BottomUpPredictor(Predictor):
    """Multi-instance inference via PAF grouping (inference.py:3056)."""

    bottomup_model: Optional[TrainedModel] = None
    peak_threshold: float = 0.2
    integral_refinement: bool = True
    integral_patch_size: int = 5
    batch_size: int = 4
    max_edge_length_ratio: float = 0.25
    dist_penalty_weight: float = 1.0
    paf_line_points: int = 10
    min_line_scores: float = 0.25
    max_instances: Optional[int] = None
    max_peaks_per_node: int = 16
    tracker: Any = None

    _infer_fn: Any = attr.ib(default=None, init=False, repr=False)
    _paf_scorer: Any = attr.ib(default=None, init=False, repr=False)

    @classmethod
    def from_trained_models(cls, model_path: str, **kwargs) -> "BottomUpPredictor":
        return cls(bottomup_model=load_trained_model(model_path), **kwargs)

    @property
    def bottomup_config(self):
        return self.bottomup_model.config

    def _make_paf_scorer(self) -> PAFScorer:
        return PAFScorer.from_config(
            self.bottomup_config.model.heads.multi_instance,
            max_edge_length_ratio=self.max_edge_length_ratio,
            dist_penalty_weight=self.dist_penalty_weight,
            n_points=self.paf_line_points,
            min_line_scores=self.min_line_scores,
        )

    def _build_infer_fn(self):
        tm = self.bottomup_model
        heads = self.bottomup_config.model.heads.multi_instance
        cm_stride = heads.confmaps.output_stride
        paf_stride = heads.pafs.output_stride
        input_scale = tm.input_scale
        pad = self.bottomup_config.data.preprocessing.pad_to_stride or tm.model.maximum_stride
        threshold = self.peak_threshold
        refinement = "integral" if self.integral_refinement else "local"
        patch = self.integral_patch_size
        K = self.max_peaks_per_node
        scorer = self._make_paf_scorer()
        edge_inds = jnp.asarray(scorer.edge_inds, jnp.int32)

        # Optional: without an offset head, the model can emit the confmap
        # head channels-first ((C, S, H, W) via an einsum dot — the param
        # tree is unchanged) so the peak finder skips its NHWC->NCHW
        # relayout. See CHANNELS_FIRST_CONFMAPS above for why this defaults
        # off (measured slower in context on the bench config).
        module = tm.module
        channels_first = False
        if (
            CHANNELS_FIRST_CONFMAPS
            and hasattr(module, "channels_first_heads")
            and not any("OffsetRefinement" in s[0] for s in module.head_specs)
        ):
            module = module.clone(
                channels_first_heads=("MultiInstanceConfmapsHead",)
            )
            channels_first = True

        @jax.jit
        def infer(images):
            imgs = _preprocess(
                images, tm.grayscale, input_scale, pad,
                imagenet_mode=tm.imagenet_mode,
                defer_float=_can_defer_float(tm),
            )
            out = module.apply(tm.variables, imgs, train=False)
            cms = out[find_head(out, "MultiInstanceConfmapsHead")]
            pafs = out[find_head(out, "PartAffinityFieldsHead")]
            off_key = find_head(out, "OffsetRefinementHead")
            if off_key is not None:
                peaks, vals, mask = find_local_peaks_with_offsets(
                    cms, out[off_key], max_peaks=K, threshold=threshold
                )
            else:
                peaks, vals, mask = find_local_peaks(
                    cms, max_peaks=K, threshold=threshold,
                    refinement=refinement, integral_patch_size=patch,
                    channels_first=channels_first,
                )
            peaks = peaks * float(cm_stride)  # model-input scale
            scores = score_paf_lines_batch(
                pafs,
                peaks,
                edge_inds,
                n_line_points=scorer.n_points,
                pafs_stride=paf_stride,
                max_edge_length_ratio=scorer.max_edge_length_ratio,
                dist_penalty_weight=scorer.dist_penalty_weight,
            )
            dst_for_src, match_scores, match_valid = match_candidates_batch(scores)
            # Greedy assembly runs on-chip too (masked fixed-iteration scan,
            # SURVEY §7.5c) — the whole frames->instances pipeline is one
            # jitted computation with no host post-processing on the hot path.
            grouped = scorer.group_batch(peaks, vals, dst_for_src, match_scores)
            instances = grouped["instances"]
            if input_scale != 1.0:
                instances = instances / input_scale + 0.5
            return {
                "instances": instances,
                "instance_peak_vals": grouped["instance_peak_vals"],
                "instance_scores": grouped["instance_scores"],
                "instance_valid": grouped["instance_valid"],
            }

        return infer

    def _predict_generator(self, provider):
        if self._infer_fn is None:
            self._infer_fn = self._build_infer_fn()
            self._paf_scorer = self._make_paf_scorer()
        total = len(provider)
        done = 0
        t0 = time.time()
        for batch, n_valid, dev_img in stage_to_device(
            prefetch(batch_examples(provider, self.batch_size))
        ):
            out = self._infer_fn(dev_img)
            out = {k: np.asarray(v) for k, v in out.items()}
            # Host: unpack the fixed-size on-chip assembly output into
            # per-sample ragged lists (tiny bookkeeping only).
            instance_peaks, instance_peak_vals, instance_scores = [], [], []
            for s in range(out["instances"].shape[0]):
                keep = out["instance_valid"][s]
                inst = out["instances"][s][keep]
                inst_vals = out["instance_peak_vals"][s][keep]
                inst_scores = out["instance_scores"][s][keep]
                if self.max_instances is not None and len(inst) > self.max_instances:
                    order = np.argsort(-inst_scores)[: self.max_instances]
                    inst, inst_vals, inst_scores = (
                        inst[order], inst_vals[order], inst_scores[order],
                    )
                instance_peaks.append(inst)
                instance_peak_vals.append(inst_vals)
                instance_scores.append(inst_scores)
            ex = {
                "instance_peaks": instance_peaks,
                "instance_peak_vals": instance_peak_vals,
                "instance_scores": instance_scores,
                "image": batch["image"],
                "video_ind": batch["video_ind"],
                "frame_ind": batch["frame_ind"],
                "n_valid": n_valid,
            }
            done += n_valid
            if self.verbosity != "none":
                self._report_progress(done, total, t0)
            yield ex

    def _make_labeled_frames_from_generator(self, generator, provider):
        skeleton = _skeleton_from_config(self.bottomup_config)
        frames = []
        for ex in generator:
            for i in range(ex["n_valid"]):
                instances = []
                for pts, confs, score in zip(
                    ex["instance_peaks"][i],
                    ex["instance_peak_vals"][i],
                    ex["instance_scores"][i],
                ):
                    if np.all(np.isnan(pts)):
                        continue
                    instances.append(
                        PredictedInstance.from_arrays(
                            points=pts,
                            point_confidences=confs,
                            instance_score=float(score),
                            skeleton=skeleton,
                        )
                    )
                frames.append(
                    LabeledFrame(
                        video=provider.videos[int(ex["video_ind"][i])],
                        frame_idx=int(ex["frame_ind"][i]),
                        instances=instances,
                    )
                )
        return _attach_tracker(self, frames, provider)
