"""Image-feature-based labeling suggestions.

Rebuild of ``/root/reference/sleap/info/feature_suggestions.py``
(``FeatureSuggestionPipeline:550``, ``ParallelFeaturePipeline:630``): sample
frames from videos, compute per-frame feature descriptors (raw/brisk/hog),
reduce with PCA, cluster with k-means, and pick a diverse subset per cluster
to suggest for labeling.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

import attr
import numpy as np

from sleap_tpu.core.labels import SuggestionFrame
from sleap_tpu.io.video import Video

logger = logging.getLogger(__name__)


@attr.s(auto_attribs=True)
class FrameItem:
    video: Video
    frame_idx: int


@attr.s(auto_attribs=True)
class FeatureSuggestionPipeline:
    """Sample -> featurize -> PCA -> k-means -> per-cluster pick."""

    per_video: int = 20
    sample_method: str = "stride"  # "stride" | "random"
    scale: float = 1.0
    merge_video_features: str = "across all videos"
    feature_type: str = "raw"  # "raw" | "brisk" | "hog"
    brisk_threshold: int = 40
    vocab_size: int = 20
    n_components: int = 5
    n_clusters: int = 5
    per_cluster: int = 5

    def get_sample_idxs(self, video: Video) -> List[int]:
        n = video.num_frames
        count = min(self.per_video, n)
        if self.sample_method == "random":
            rng = np.random.default_rng(0)
            return sorted(rng.choice(n, size=count, replace=False).tolist())
        return np.linspace(0, n - 1, count).astype(int).tolist()

    def _frame_feature(self, img: np.ndarray) -> np.ndarray:
        import cv2

        if img.ndim == 3 and img.shape[-1] == 3:
            img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        elif img.ndim == 3:
            img = img[..., 0]
        if self.scale != 1.0:
            img = cv2.resize(img, None, None, self.scale, self.scale)
        if self.feature_type == "brisk":
            # BRISK is absent from minimal OpenCV builds; ORB is the closest
            # available binary descriptor and serves the same purpose here.
            factory = getattr(cv2, "BRISK_create", None) or getattr(
                cv2, "ORB_create", None
            )
            if factory is None:
                return cv2.resize(img, (32, 32)).ravel().astype("f4")
            detector = factory()
            _, descriptors = detector.detectAndCompute(img, None)
            if descriptors is None or len(descriptors) == 0:
                return np.zeros(32, "f4")
            return descriptors.mean(axis=0).astype("f4")
        if self.feature_type == "hog":
            # Histogram of oriented gradients, computed directly (HOGDescriptor
            # is absent from minimal OpenCV builds).
            resized = cv2.resize(img, (32, 32)).astype("f4")
            gx = cv2.Sobel(resized, cv2.CV_32F, 1, 0)
            gy = cv2.Sobel(resized, cv2.CV_32F, 0, 1)
            mag = np.hypot(gx, gy)
            ang = (np.arctan2(gy, gx) % np.pi) / np.pi * 9
            bins = np.clip(ang.astype(int), 0, 8)
            feat = []
            for cy in range(4):
                for cx in range(4):
                    m = mag[cy * 8 : (cy + 1) * 8, cx * 8 : (cx + 1) * 8]
                    b = bins[cy * 8 : (cy + 1) * 8, cx * 8 : (cx + 1) * 8]
                    feat.append(np.bincount(b.ravel(), m.ravel(), minlength=9))
            return np.concatenate(feat).astype("f4")
        # raw: downsampled pixels
        small = cv2.resize(img, (32, 32))
        return small.ravel().astype("f4")

    def get_suggestion_frames(
        self, videos: List[Video], group_offset: int = 0
    ) -> List[SuggestionFrame]:
        from sklearn.cluster import KMeans
        from sklearn.decomposition import PCA

        items: List[FrameItem] = []
        feats: List[np.ndarray] = []
        for video in videos:
            for fi in self.get_sample_idxs(video):
                try:
                    img = video.get_frame(fi)
                except Exception:
                    continue
                items.append(FrameItem(video, fi))
                feats.append(self._frame_feature(np.asarray(img)))
        if not items:
            return []
        X = np.stack(feats)
        n_comp = min(self.n_components, X.shape[0], X.shape[1])
        if n_comp >= 1 and X.shape[0] > 1:
            X = PCA(n_components=n_comp).fit_transform(X)
        n_clusters = min(self.n_clusters, len(items))
        clusters = KMeans(n_clusters=n_clusters, n_init=3, random_state=0).fit_predict(X)

        suggestions = []
        for ci in range(n_clusters):
            members = np.where(clusters == ci)[0][: self.per_cluster]
            for mi in members:
                suggestions.append(
                    SuggestionFrame(
                        video=items[mi].video,
                        frame_idx=items[mi].frame_idx,
                        group=ci + group_offset,
                    )
                )
        return suggestions


def _suggest_one_video(args) -> List[tuple]:
    """Process-pool worker: run the pipeline on one video, return serialized
    (video_idx, frame_idx, group) tuples (reference ParallelFeaturePipeline.get)."""
    pipeline_kwargs, video_idx, filename, video_kwargs = args
    pipeline = FeatureSuggestionPipeline(**pipeline_kwargs)
    video = Video.from_filename(filename, **video_kwargs)
    suggestions = pipeline.get_suggestion_frames(
        [video], group_offset=video_idx * pipeline.n_clusters
    )
    return [(video_idx, s.frame_idx, s.group) for s in suggestions]


class ParallelFeaturePipeline:
    """Per-video process-pool parallelization of the suggestion pipeline
    (reference feature_suggestions.py:630). Videos are serialized by
    filename, each worker runs the full sample->featurize->PCA->k-means
    chain for its video, and the parent reassembles ``SuggestionFrame``s.
    Videos without an on-disk backing (numpy-backed) fall back to in-process
    execution."""

    @classmethod
    def run(
        cls,
        pipeline: FeatureSuggestionPipeline,
        videos: List[Video],
        parallel: bool = True,
    ) -> List[SuggestionFrame]:
        pipeline_kwargs = attr.asdict(pipeline)
        jobs, serial_idxs = [], []
        for vi, video in enumerate(videos):
            fn = getattr(video.backend, "filename", None)
            if parallel and isinstance(fn, str):
                kwargs = {}
                dataset = getattr(video.backend, "dataset", None)
                if dataset:
                    kwargs["dataset"] = dataset
                jobs.append((pipeline_kwargs, vi, fn, kwargs))
            else:
                serial_idxs.append(vi)

        tuples: List[tuple] = []
        if jobs:
            import __main__

            main_file = getattr(__main__, "__file__", None)
            spawnable = main_file is None or os.path.exists(main_file)
            if len(jobs) == 1 or not spawnable:
                # Interactive / stdin parents can't be re-imported by
                # spawn/forkserver children (the Pool would respawn dying
                # workers forever) — run in-process instead.
                for job in jobs:
                    tuples.extend(_suggest_one_video(job))
            else:
                # Not plain fork: the parent holds live JAX/XLA threads and
                # fork() under a multithreaded runtime can deadlock children.
                # Forkserver forks from a clean single-threaded server and,
                # unlike spawn, does not re-import __main__ (so stdin-driven
                # scripts work too).
                import multiprocessing

                try:
                    ctx = multiprocessing.get_context("forkserver")
                except ValueError:  # platform without forkserver
                    ctx = multiprocessing.get_context("spawn")
                with ctx.Pool(processes=min(len(jobs), 4)) as pool:
                    for result in pool.map(_suggest_one_video, jobs):
                        tuples.extend(result)
        suggestions = [
            SuggestionFrame(video=videos[vi], frame_idx=fi, group=g)
            for vi, fi, g in tuples
        ]
        for vi in serial_idxs:
            suggestions.extend(
                pipeline.get_suggestion_frames(
                    [videos[vi]], group_offset=vi * pipeline.n_clusters
                )
            )
        return suggestions
