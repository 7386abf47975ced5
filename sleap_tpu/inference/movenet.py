"""MoveNet adapter: COCO-17 single-instance predictor wrapper.

Rebuild of ``/root/reference/sleap/nn/inference.py:4608-4862``
(``make_model_movenet``, ``MoveNetInferenceLayer``, ``MoveNetPredictor``).
The reference downloads a TF-Hub MoveNet ("lightning"/"thunder") at runtime;
this environment has no egress, so ONLY the download is gated:

- ``MoveNetPredictor.from_trained_models("lightning", model_path=...)`` runs
  a locally provided MoveNet (a TF SavedModel directory — TF is importable
  here — or any python callable with the MoveNet signature).
- Without ``model_path`` construction raises with download instructions.

All of the surrounding predictor logic (resize-and-pad preprocessing, the
``[y, x, score] -> (x, y) * image_size`` output decode, confidence
thresholding, coordinate un-scaling, frame assembly) is implemented and
tested with an injected fake model.
"""

from __future__ import annotations

import time
from typing import Any, Callable, List, Optional

import attr
import numpy as np

from sleap_tpu.core.instance import LabeledFrame, PredictedInstance
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.data.providers import batch_examples
from sleap_tpu.data.prefetch import prefetch
from sleap_tpu.inference.predictors import Predictor, _attach_tracker

MOVENET_MODELS = {
    "lightning": {"image_size": 192},
    "thunder": {"image_size": 256},
}

COCO_17_NODES: List[str] = [
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
]

COCO_17_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 4), (0, 5), (0, 6), (5, 7), (7, 9),
    (6, 8), (8, 10), (5, 6), (5, 11), (6, 12), (11, 12), (11, 13),
    (13, 15), (12, 14), (14, 16),
]


def movenet_skeleton() -> Skeleton:
    """The 17-keypoint COCO skeleton MoveNet predicts."""
    return Skeleton.from_names_and_edge_inds(
        COCO_17_NODES, COCO_17_EDGES, name="movenet"
    )


def load_local_movenet(model_path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Wrap a local MoveNet TF SavedModel as ``images -> (B, 1, 17, 3)``.

    The SavedModel contract is TF-Hub MoveNet's ``serving_default`` signature
    (int32 images in, ``output_0`` with normalized ``[y, x, score]`` rows).
    """
    import tensorflow as tf  # local import: TF is slow to load and optional

    loaded = tf.saved_model.load(model_path)
    sig = loaded.signatures["serving_default"]

    def model_fn(images: np.ndarray) -> np.ndarray:
        out = sig(tf.constant(images, dtype=tf.int32))
        return out["output_0"].numpy()

    return model_fn


@attr.s(auto_attribs=True)
class MoveNetPredictor(Predictor):
    """MoveNet single-instance predictor (reference inference.py:4729).

    ``model_fn`` maps int32 images ``(1, S, S, 3)`` to normalized keypoints
    ``(1, 1, 17, 3)`` rows ``[y, x, score]`` — the TF-Hub MoveNet contract.
    """

    model_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None
    model_name: str = "lightning"
    peak_threshold: float = 0.2
    batch_size: int = 1  # the underlying model is batch-1 only
    tracker: Any = None

    @property
    def image_size(self) -> int:
        return MOVENET_MODELS[self.model_name]["image_size"]

    @property
    def is_grayscale(self) -> bool:
        return False

    @classmethod
    def from_trained_models(
        cls,
        model_name: str = "lightning",
        model_path: Optional[str] = None,
        peak_threshold: float = 0.2,
        **kwargs,
    ) -> "MoveNetPredictor":
        """Create a MoveNet predictor.

        Args:
            model_name: "lightning" (192 px) or "thunder" (256 px).
            model_path: Local TF SavedModel directory (or a python callable
                with the MoveNet signature). Required here: the TF-Hub
                download the reference performs needs network egress.
        """
        if model_name not in MOVENET_MODELS:
            raise ValueError(f"Unknown MoveNet model {model_name!r}.")
        if model_path is None:
            raise NotImplementedError(
                "TF-Hub downloads are unavailable in this offline "
                "environment. Download MoveNet "
                f"('https://tfhub.dev/google/movenet/singlepose/{model_name}') "
                "on a connected machine, save it with tf.saved_model.save, "
                "and pass model_path=<local dir>."
            )
        model_fn = model_path if callable(model_path) else load_local_movenet(model_path)
        return cls(
            model_fn=model_fn,
            model_name=model_name,
            peak_threshold=peak_threshold,
            batch_size=1,
            **kwargs,
        )

    # ------------------------------------------------------------------ #
    def _preprocess_frame(self, img: np.ndarray):
        """Resize-and-pad to (S, S) RGB (reference data_config:4760-4766).

        Returns (int32 image, scale) where points map back as ``pts / scale``.
        """
        size = self.image_size
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        h, w = img.shape[0], img.shape[1]
        scale = min(size / h, size / w)
        new_h, new_w = int(round(h * scale)), int(round(w * scale))
        if (new_h, new_w) != (h, w):
            import cv2

            img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
            if img.ndim == 2:
                img = img[..., None]
        out = np.zeros((size, size, 3), np.int32)
        out[:new_h, :new_w] = img
        return out, scale

    def _predict_generator(self, provider):
        if self.model_fn is None:
            raise ValueError("model_fn not set; use from_trained_models().")
        total = len(provider)
        done = 0
        t0 = time.time()
        size = self.image_size
        for batch, n_valid in prefetch(batch_examples(provider, self.batch_size)):
            points_all, confs_all = [], []
            for i in range(n_valid):
                img, scale = self._preprocess_frame(np.asarray(batch["image"][i]))
                raw = np.asarray(self.model_fn(img[None]), np.float32).reshape(17, 3)
                # [y, x, score] normalized -> (x, y) in padded-image pixels
                # (reference split_outputs, inference.py:4634-4640).
                pts = raw[:, [1, 0]] * size
                pts = pts / scale  # back to original frame coordinates
                points_all.append(pts)
                confs_all.append(raw[:, 2])
            done += n_valid
            if self.verbosity != "none":
                self._report_progress(done, total, t0)
            yield {
                "instance_peaks": np.asarray(points_all),
                "confidences": np.asarray(confs_all),
                "video_ind": np.asarray(batch["video_ind"][:n_valid]),
                "frame_ind": np.asarray(batch["frame_ind"][:n_valid]),
                "n_valid": n_valid,
            }

    def _make_labeled_frames_from_generator(self, generator, provider):
        skeleton = movenet_skeleton()
        frames = []
        for ex in generator:
            for i in range(ex["n_valid"]):
                points = np.array(ex["instance_peaks"][i], np.float64)
                confs = np.asarray(ex["confidences"][i], np.float64)
                points[confs < self.peak_threshold] = np.nan
                instances = []
                if not np.all(np.isnan(points)):
                    instances.append(
                        PredictedInstance.from_arrays(
                            points=points,
                            point_confidences=confs,
                            instance_score=float(np.nansum(confs)),
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
