"""Host-side data providers.

Rebuild of ``/root/reference/sleap/nn/data/providers.py`` (``LabelsReader:11``,
``VideoReader:306``) without tf.data: providers are plain iterators yielding
numpy frames plus metadata dicts. Device transfer, normalization, and resizing
happen on-chip inside the jitted predictor step — the provider's job is only
decode + batch assembly (uint8, minimal host work).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import attr
import numpy as np

from sleap_tpu.core.labels import Labels
from sleap_tpu.io.video import Video


@attr.s(auto_attribs=True)
class LabelsReader:
    """Iterates labeled frames from a :class:`Labels` project.

    Yields dicts with ``image`` (H, W, C uint8), ``video_ind``, ``frame_ind``,
    plus ground-truth ``instances`` (n_inst, n_nodes, 2) when present.
    """

    labels: Labels
    user_instances_only: bool = False
    example_indices: Optional[Sequence[int]] = None

    @classmethod
    def from_user_instances(cls, labels: Labels) -> "LabelsReader":
        """Reader over frames with user instances. Instances with no visible
        points are removed from ``labels`` IN PLACE first, like the
        reference (providers.py:42 filters via ``points_array`` visibility);
        frames left empty are dropped."""
        labels.remove_empty_instances(keep_empty_frames=False)
        inds = [i for i, lf in enumerate(labels.labeled_frames) if lf.has_user_instances]
        return cls(labels=labels, user_instances_only=True, example_indices=inds)

    @classmethod
    def from_unlabeled_suggestions(cls, labels: Labels) -> "LabelsReader":
        inds = []
        for s in labels.suggestions:
            lf = labels.find_first(s.video, s.frame_idx)
            if lf is None or not lf.has_user_instances:
                frame_key = (s.video, s.frame_idx)
                inds.append(frame_key)
        reader = cls(labels=labels, example_indices=None)
        reader._suggestion_keys = inds
        return reader

    @property
    def videos(self) -> List[Video]:
        return self.labels.videos

    def __len__(self) -> int:
        if self.example_indices is not None:
            return len(self.example_indices)
        return len(self.labels)

    @property
    def max_height_and_width(self) -> Tuple[int, int]:
        return (
            max(v.height for v in self.videos),
            max(v.width for v in self.videos),
        )

    @property
    def is_from_multi_size_videos(self) -> bool:
        """True when videos differ in frame size (reference providers.py:99)."""
        sizes = {(v.height, v.width) for v in self.videos}
        return len(sizes) > 1

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices = (
            self.example_indices
            if self.example_indices is not None
            else range(len(self.labels))
        )
        video_ids = {id(v): i for i, v in enumerate(self.labels.videos)}
        for i in indices:
            lf = self.labels[int(i)]
            try:
                image = lf.image
            except Exception:
                continue
            instances = (
                lf.training_instances if self.user_instances_only else lf.instances
            )
            gt = (
                np.stack([inst.numpy() for inst in instances], axis=0).astype(
                    np.float32
                )
                if instances
                else np.zeros((0, 0, 2), np.float32)
            )
            tracks = [inst.track for inst in instances]
            yield {
                "image": image,
                "raw_image_size": np.asarray(image.shape, np.int32),
                "video_ind": video_ids[id(lf.video)],
                "frame_ind": lf.frame_idx,
                "instances": gt,
                "scale": np.array([1.0, 1.0], np.float32),
                "skeleton_inds": np.asarray(
                    [
                        self.labels.skeletons.index(inst.skeleton)
                        if inst.skeleton in self.labels.skeletons
                        else 0
                        for inst in instances
                    ],
                    np.int32,
                ),
                "track_inds": [
                    self.labels.tracks.index(t) if t in self.labels.tracks else -1
                    for t in tracks
                ],
                "example_ind": int(i),
            }


@attr.s(auto_attribs=True)
class VideoReader:
    """Iterates frames of a single video (reference providers.py:306)."""

    video: Video
    example_indices: Optional[Sequence[int]] = None

    @classmethod
    def from_filepath(cls, filename: str, example_indices=None, **kwargs) -> "VideoReader":
        return cls(video=Video.from_filename(filename, **kwargs), example_indices=example_indices)

    @property
    def videos(self) -> List[Video]:
        return [self.video]

    def __len__(self) -> int:
        if self.example_indices is not None:
            return len(self.example_indices)
        return self.video.num_frames

    @property
    def max_height_and_width(self) -> Tuple[int, int]:
        return self.video.height, self.video.width

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices = (
            self.example_indices
            if self.example_indices is not None
            else range(self.video.num_frames)
        )
        for i in indices:
            try:
                image = self.video.get_frame(int(i))
            except Exception:
                # Unreadable frame: stop gracefully (reference inference.py:2690).
                break
            yield {
                "image": image,
                "raw_image_size": np.asarray(image.shape, np.int32),
                "video_ind": 0,
                "frame_ind": int(i),
                "scale": np.array([1.0, 1.0], np.float32),
            }


def resize_and_pad_example(
    image: np.ndarray, target_hw: Tuple[int, int]
) -> Tuple[np.ndarray, float]:
    """Host-side SizeMatcher (reference resizing.py:257): scale to fit the
    target, pad bottom/right; returns (image, scale)."""
    import cv2

    h, w = image.shape[:2]
    th, tw = target_hw
    if (h, w) == (th, tw):
        return image, 1.0
    scale = min(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(image, (nw, nh))
    if resized.ndim == 2:
        resized = resized[..., None]
    out = np.zeros((th, tw, image.shape[2]), dtype=image.dtype)
    out[:nh, :nw] = resized
    return out, scale


def batch_examples(
    provider, batch_size: int, target_hw: Optional[Tuple[int, int]] = None
) -> Iterator[Tuple[Dict[str, np.ndarray], int]]:
    """Group provider examples into fixed-size batches.

    The last batch is padded by repeating its final example so on-device
    shapes stay static; yields ``(batch_dict, n_valid)``. With ``target_hw``,
    frames are size-matched on host and a per-example ``scale`` is carried
    for inverse coordinate mapping.
    """
    buf: List[Dict[str, Any]] = []

    def emit(buf):
        n_valid = len(buf)
        while len(buf) < batch_size:
            buf.append(buf[-1])
        batch = {
            "image": np.stack([ex["image"] for ex in buf], axis=0),
            "video_ind": np.array([ex["video_ind"] for ex in buf]),
            "frame_ind": np.array([ex["frame_ind"] for ex in buf]),
            # Providers carry the reference's per-example (sx, sy) scale pair;
        # size matching is isotropic here, so batches carry the scalar.
        "scale": np.array(
            [np.asarray(ex.get("scale", 1.0), "f4").reshape(-1)[0] for ex in buf],
            "f4",
        ),
        }
        return batch, n_valid

    for ex in provider:
        if target_hw is not None:
            img, scale = resize_and_pad_example(ex["image"], target_hw)
            ex = dict(ex)
            ex["image"] = img
            ex["scale"] = scale
        buf.append(ex)
        if len(buf) == batch_size:
            yield emit(buf)
            buf = []
    if buf:
        yield emit(buf)


def provider_needs_size_matching(provider) -> Optional[Tuple[int, int]]:
    """Target (h, w) when the provider's videos differ in size, else None."""
    videos = provider.videos
    if len(videos) <= 1:
        return None
    sizes = {(v.height, v.width) for v in videos}
    if len(sizes) <= 1:
        return None
    return provider.max_height_and_width
