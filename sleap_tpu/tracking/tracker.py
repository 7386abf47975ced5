"""Cross-frame instance tracking.

Rebuild of ``/root/reference/sleap/nn/tracking.py`` (``Tracker:542``,
``FlowCandidateMaker:110``, ``SimpleCandidateMaker:442``, max-tracks variants
at :361/:465, ``make_tracker_by_name:844``, ``run_tracker:1542``,
``retrack:1583``). The flow-shift candidate maker uses the on-chip batched
Lucas-Kanade op (:mod:`sleap_tpu.ops.optical_flow`) instead of per-frame host
OpenCV calls.
"""

from __future__ import annotations

import logging
from collections import deque
from typing import Any, Callable, Deque, Dict, List, Optional, Tuple

import attr
import numpy as np

from sleap_tpu.core.instance import Instance, PredictedInstance, Track
from sleap_tpu.tracking.components import (
    FrameMatches,
    cull_frame_instances,
    connect_single_track_breaks,
    factory_object_keypoint_similarity,
    first_choice_matching,
    greedy_matching,
    hungarian_matching,
    instance_iou,
    instance_similarity,
    centroid_distance,
    normalized_instance_similarity,
)

logger = logging.getLogger(__name__)


@attr.s(auto_attribs=True, eq=False)
class ShiftedInstance:
    """A prior instance displaced into the current frame by optical flow
    (reference tracking.py:34)."""

    points_array: np.ndarray
    skeleton: Any
    track: Optional[Track]
    frame_t: int
    shift_score: float = 0.0

    def numpy(self) -> np.ndarray:
        return self.points_array

    @property
    def centroid(self) -> np.ndarray:
        return np.nanmean(self.points_array, axis=0)

    @property
    def bounding_box(self) -> np.ndarray:
        pts = self.points_array
        return np.array(
            [
                np.nanmin(pts[:, 1]),
                np.nanmin(pts[:, 0]),
                np.nanmax(pts[:, 1]),
                np.nanmax(pts[:, 0]),
            ]
        )

    @property
    def n_visible_points(self) -> int:
        return int(np.sum(~np.isnan(self.points_array).any(axis=-1)))


@attr.s(auto_attribs=True)
class MatchedFrameInstances:
    t: int
    instances_t: List[Instance]
    img_t: Optional[np.ndarray] = None


@attr.s(auto_attribs=True)
class MatchedFrameInstance:
    t: int
    instance_t: Instance
    img_t: Optional[np.ndarray] = None


@attr.s(auto_attribs=True)
class SimpleCandidateMaker:
    """Candidates are raw prior-window instances (tracking.py:442)."""

    min_points: int = 0
    uses_image: bool = False

    def get_candidates(self, track_matching_queue, t=None, img=None, **kwargs):
        candidates = []
        for match_item in track_matching_queue:
            for inst in match_item.instances_t:
                if inst.n_visible_points >= self.min_points:
                    candidates.append(inst)
        return candidates


@attr.s(auto_attribs=True)
class FlowCandidateMaker:
    """Flow-shift candidates: prior instances displaced by LK optical flow
    (tracking.py:110). Flow runs on-chip via :func:`lk_flow`."""

    min_points: int = 0
    img_scale: float = 1.0
    of_window_size: int = 21
    of_max_levels: int = 3
    save_shifted_instances: bool = False
    uses_image: bool = True

    shifted_instances: Dict[Tuple[int, int], List[ShiftedInstance]] = attr.ib(
        factory=dict
    )

    def get_candidates(self, track_matching_queue, t=None, img=None, **kwargs):
        candidates = []
        for match_item in track_matching_queue:
            ref_t, ref_img, ref_instances = (
                match_item.t,
                match_item.img_t,
                match_item.instances_t,
            )
            if not ref_instances or ref_img is None or img is None:
                continue
            shifted = self.flow_shift_instances(
                ref_instances,
                ref_img,
                img,
                min_shifted_points=self.min_points,
                scale=self.img_scale,
                window_size=self.of_window_size,
                max_levels=self.of_max_levels,
                frame_t=ref_t,
            )
            if self.save_shifted_instances:
                self.shifted_instances[(ref_t, t)] = shifted
            candidates.extend(shifted)
        return candidates

    @staticmethod
    def flow_shift_instances(
        ref_instances: List[Instance],
        ref_img: np.ndarray,
        new_img: np.ndarray,
        min_shifted_points: int = 0,
        scale: float = 1.0,
        window_size: int = 21,
        max_levels: int = 3,
        frame_t: int = 0,
    ) -> List[ShiftedInstance]:
        """Shift prior instances onto the new frame (tracking.py:255-357)."""
        import jax.numpy as jnp

        from sleap_tpu.ops.optical_flow import lk_flow

        def to_gray(im):
            im = np.asarray(im)
            im = np.squeeze(im)
            if im.ndim == 3 and im.shape[-1] == 3:
                im = im @ np.array([0.114, 0.587, 0.299])  # BGR luma, cv2-style
            elif im.ndim == 3:
                im = im[..., 0]
            return im.astype("f4")

        ref_gray = to_gray(ref_img)
        new_gray = to_gray(new_img)
        if scale != 1.0:
            import cv2

            ref_gray = cv2.resize(ref_gray, None, None, scale, scale)
            new_gray = cv2.resize(new_gray, None, None, scale, scale)

        ref_pts = [inst.numpy() for inst in ref_instances]
        all_pts = np.concatenate(ref_pts, axis=0).astype("f4") * scale
        shifted_pts, status, errs = lk_flow(
            jnp.asarray(ref_gray),
            jnp.asarray(new_gray),
            jnp.asarray(all_pts),
            window_size=window_size,
            max_levels=max_levels,
        )
        shifted_pts = np.asarray(shifted_pts) / scale
        status = np.asarray(status)
        errs = np.asarray(errs)

        sections = np.cumsum([len(p) for p in ref_pts])[:-1]
        shifted_split = np.split(shifted_pts, sections, axis=0)
        status_split = np.split(status, sections, axis=0)
        errs_split = np.split(errs, sections, axis=0)

        shifted_instances = []
        for ref, pts, found, err in zip(
            ref_instances, shifted_split, status_split, errs_split
        ):
            if found.sum() > min_shifted_points:
                points = np.where(found[:, None], pts, np.nan)
                shifted_instances.append(
                    ShiftedInstance(
                        points_array=points,
                        skeleton=ref.skeleton,
                        track=ref.track,
                        frame_t=frame_t,
                        shift_score=-float(np.mean(err[found.astype(bool)]))
                        if found.any()
                        else -np.inf,
                    )
                )
        return shifted_instances


@attr.s(auto_attribs=True)
class PrecomputedFlowCandidateMaker:
    """Flow-shift candidates from externally computed shifts.

    TPU-native split of the reference FlowTracker (no reference analog): the
    chip computes Lucas-Kanade flow for a whole clip in BATCHES (one jitted
    scan, see ``bench.py`` tracking config), and the host tracker consumes
    the precomputed shifts here — instead of dispatching one small LK per
    frame pair from inside ``Tracker.track``. ``shift_fn(ref_t, t,
    ref_instances)`` returns the :class:`ShiftedInstance` list for the
    reference frame's instances displaced onto frame ``t`` (empty/None when
    no shifts are available for that pair).
    """

    shift_fn: Any = None
    uses_image: bool = False

    def get_candidates(self, track_matching_queue, t=None, img=None, **kwargs):
        candidates = []
        if self.shift_fn is None:
            return candidates
        for match_item in track_matching_queue:
            if not match_item.instances_t:
                continue
            shifted = self.shift_fn(match_item.t, t, match_item.instances_t)
            if shifted:
                candidates.extend(shifted)
        return candidates


@attr.s(auto_attribs=True)
class SimpleMaxTracksCandidateMaker(SimpleCandidateMaker):
    """Capped-track variant (tracking.py:465)."""

    max_tracks: Optional[int] = None

    def get_candidates(self, track_matching_queue_dict, max_tracking=False, t=None, img=None, **kwargs):
        candidates = []
        for track, queue in track_matching_queue_dict.items():
            for item in queue:
                if item.instance_t.n_visible_points >= self.min_points:
                    candidates.append(item.instance_t)
        return candidates


@attr.s(auto_attribs=True)
class FlowMaxTracksCandidateMaker(FlowCandidateMaker):
    """Capped-track flow variant (tracking.py:361)."""

    max_tracks: Optional[int] = None

    def get_candidates(self, track_matching_queue_dict, max_tracking=False, t=None, img=None, **kwargs):
        candidates = []
        for track, queue in track_matching_queue_dict.items():
            for item in queue:
                if item.img_t is None or img is None:
                    continue
                candidates.extend(
                    self.flow_shift_instances(
                        [item.instance_t],
                        item.img_t,
                        img,
                        min_shifted_points=self.min_points,
                        scale=self.img_scale,
                        window_size=self.of_window_size,
                        max_levels=self.of_max_levels,
                        frame_t=item.t,
                    )
                )
        return candidates


@attr.s(auto_attribs=True)
class Tracker:
    """Frame-by-frame track assignment (reference tracking.py:542)."""

    track_window: int = 5
    similarity_function: Callable = instance_similarity
    matching_function: Callable = greedy_matching
    candidate_maker: Any = attr.ib(factory=FlowCandidateMaker)
    max_tracks: Optional[int] = None
    max_tracking: bool = False
    cleaner: Optional[Callable] = None
    target_instance_count: int = 0
    pre_cull_function: Optional[Callable] = None
    post_connect_single_breaks: bool = False
    robust_best_instance: float = 1.0
    min_new_track_points: int = 0

    track_matching_queue: Deque = attr.ib()
    track_matching_queue_dict: Dict = attr.ib(factory=dict)
    spawned_tracks: List[Track] = attr.ib(factory=list)
    last_matches: Optional[FrameMatches] = None

    @track_matching_queue.default
    def _default_queue(self):
        return deque(maxlen=self.track_window)

    @property
    def has_max_tracking(self) -> bool:
        return isinstance(
            self.candidate_maker,
            (SimpleMaxTracksCandidateMaker, FlowMaxTracksCandidateMaker),
        )

    @property
    def uses_image(self) -> bool:
        return getattr(self.candidate_maker, "uses_image", False)

    @property
    def is_valid(self) -> bool:
        return self.similarity_function is not None

    def reset_candidates(self):
        if self.has_max_tracking:
            for track in self.track_matching_queue_dict:
                self.track_matching_queue_dict[track] = deque(maxlen=self.track_window)
        else:
            self.track_matching_queue = deque(maxlen=self.track_window)

    @property
    def unique_tracks_in_queue(self) -> List[Track]:
        tracks = set()
        if self.has_max_tracking:
            tracks.update(self.track_matching_queue_dict.keys())
        else:
            for item in self.track_matching_queue:
                for inst in item.instances_t:
                    tracks.add(inst.track)
        return list(tracks)

    def track(
        self,
        untracked_instances: List[Instance],
        img: Optional[np.ndarray] = None,
        t: Optional[int] = None,
        img_hw: Optional[Tuple[int, int]] = None,
    ) -> List[Instance]:
        if self.candidate_maker is None:
            return untracked_instances
        sim_fn = self.similarity_function
        if sim_fn is normalized_instance_similarity and img_hw is not None:
            import functools

            sim_fn = functools.partial(normalized_instance_similarity, img_hw=img_hw)

        if t is None:
            if self.has_max_tracking and self.track_matching_queue_dict:
                t = (
                    max(
                        (q[-1].t for q in self.track_matching_queue_dict.values() if q),
                        default=-1,
                    )
                    + 1
                )
            elif self.track_matching_queue:
                t = self.track_matching_queue[-1].t + 1
            else:
                t = 0

        tracked_instances: List[Instance] = []
        if untracked_instances:
            if self.pre_cull_function:
                self.pre_cull_function(untracked_instances)

            if self.has_max_tracking:
                candidates = self.candidate_maker.get_candidates(
                    track_matching_queue_dict=self.track_matching_queue_dict,
                    max_tracking=self.max_tracking,
                    t=t,
                    img=img,
                )
            else:
                candidates = self.candidate_maker.get_candidates(
                    track_matching_queue=self.track_matching_queue, t=t, img=img
                )

            frame_matches = FrameMatches.from_candidate_instances(
                untracked_instances=untracked_instances,
                candidate_instances=candidates,
                similarity_function=sim_fn,
                matching_function=self.matching_function,
                robust_best_instance=self.robust_best_instance,
            )
            self.last_matches = frame_matches

            for match in frame_matches.matches:
                match.instance.track = match.track
                match.instance.tracking_score = float(match.score)
                tracked_instances.append(match.instance)

            tracked_instances.extend(
                self.spawn_for_untracked_instances(frame_matches.unmatched_instances, t)
            )

        # Update matching queues.
        if self.has_max_tracking:
            for inst in tracked_instances:
                if inst.track in self.track_matching_queue_dict:
                    self.track_matching_queue_dict[inst.track].append(
                        MatchedFrameInstance(t, inst, img)
                    )
                elif (
                    not self.max_tracking
                    or len(self.track_matching_queue_dict) < (self.max_tracks or 0)
                ):
                    self.track_matching_queue_dict[inst.track] = deque(
                        maxlen=self.track_window
                    )
                    self.track_matching_queue_dict[inst.track].append(
                        MatchedFrameInstance(t, inst, img)
                    )
        else:
            self.track_matching_queue.append(
                MatchedFrameInstances(t, tracked_instances, img)
            )
        return tracked_instances

    def spawn_for_untracked_instances(
        self, unmatched_instances: List[Instance], t: int
    ) -> List[Instance]:
        """Create new tracks for unmatched instances (tracking.py:789)."""
        results = []
        for inst in unmatched_instances:
            if inst.n_visible_points < self.min_new_track_points:
                continue
            if self.has_max_tracking and self.max_tracking and self.max_tracks:
                if len(self.track_matching_queue_dict) >= self.max_tracks:
                    continue
            track = Track(spawned_on=t, name=f"track_{len(self.spawned_tracks)}")
            self.spawned_tracks.append(track)
            inst.track = track
            inst.tracking_score = 1.0
            results.append(inst)
        return results

    def final_pass(self, frames) -> None:
        if self.cleaner:
            self.cleaner.run(frames)
        elif self.target_instance_count and self.post_connect_single_breaks:
            connect_single_track_breaks(frames, self.target_instance_count)

    def get_name(self) -> str:
        tracker_name = type(self.candidate_maker).__name__
        similarity_name = getattr(self.similarity_function, "__name__", "custom")
        match_name = getattr(self.matching_function, "__name__", "custom")
        return f"{tracker_name}.{similarity_name}.{match_name}"

    # ------------------------------------------------------------------ #
    @classmethod
    def make_tracker_by_name(
        cls,
        tracker: str = "flow",
        similarity: str = "instance",
        match: str = "greedy",
        robust: float = 1.0,
        track_window: int = 5,
        min_new_track_points: int = 0,
        min_match_points: int = 0,
        img_scale: float = 1.0,
        of_window_size: int = 21,
        of_max_levels: int = 3,
        save_shifted_instances: bool = False,
        target_instance_count: int = 0,
        pre_cull_to_target: bool = False,
        pre_cull_iou_threshold: Optional[float] = None,
        post_connect_single_breaks: bool = False,
        clean_instance_count: int = 0,
        clean_iou_threshold: Optional[float] = None,
        max_tracking: bool = False,
        max_tracks: Optional[int] = None,
        oks_errors: Optional[list] = None,
        oks_score_weighting: bool = False,
        oks_normalization: str = "all",
        kf_node_indices: Optional[list] = None,
        kf_init_frame_count: int = 0,
        **kwargs,
    ) -> "Tracker":
        """Full option surface of the reference factory (tracking.py:844)."""
        if tracker.lower() == "none":
            return cls(candidate_maker=None, similarity_function=None)

        if max_tracks is not None:
            max_tracking = True

        similarity_map = {
            "instance": instance_similarity,
            "normalized_instance": normalized_instance_similarity,
            "centroid": centroid_distance,
            "iou": instance_iou,
            "object_keypoint": factory_object_keypoint_similarity(
                keypoint_errors=oks_errors,
                score_weighting=oks_score_weighting,
                normalization_keypoints=oks_normalization,
            ),
            "object keypoint": factory_object_keypoint_similarity(
                keypoint_errors=oks_errors,
                score_weighting=oks_score_weighting,
                normalization_keypoints=oks_normalization,
            ),
        }
        matching_map = {
            "hungarian": hungarian_matching,
            "greedy": greedy_matching,
            "first_choice": first_choice_matching,
        }
        if similarity not in similarity_map:
            raise ValueError(f"Unknown similarity {similarity!r}.")
        if match not in matching_map:
            raise ValueError(f"Unknown matching {match!r}.")

        if tracker == "flow":
            if max_tracking:
                candidate_maker = FlowMaxTracksCandidateMaker(
                    min_points=min_match_points,
                    img_scale=img_scale,
                    of_window_size=of_window_size,
                    of_max_levels=of_max_levels,
                    save_shifted_instances=save_shifted_instances,
                    max_tracks=max_tracks,
                )
            else:
                candidate_maker = FlowCandidateMaker(
                    min_points=min_match_points,
                    img_scale=img_scale,
                    of_window_size=of_window_size,
                    of_max_levels=of_max_levels,
                    save_shifted_instances=save_shifted_instances,
                )
        elif tracker == "simple":
            if max_tracking:
                candidate_maker = SimpleMaxTracksCandidateMaker(
                    min_points=min_match_points, max_tracks=max_tracks
                )
            else:
                candidate_maker = SimpleCandidateMaker(min_points=min_match_points)
        elif tracker == "simplemaxtracks":
            candidate_maker = SimpleMaxTracksCandidateMaker(
                min_points=min_match_points, max_tracks=max_tracks
            )
            max_tracking = True
        elif tracker == "flowmaxtracks":
            candidate_maker = FlowMaxTracksCandidateMaker(
                min_points=min_match_points,
                img_scale=img_scale,
                of_window_size=of_window_size,
                of_max_levels=of_max_levels,
                max_tracks=max_tracks,
            )
            max_tracking = True
        else:
            raise ValueError(f"Unknown tracker {tracker!r}.")

        pre_cull_function = None
        if target_instance_count and pre_cull_to_target:
            def pre_cull_function(instances):
                instances[:] = cull_frame_instances(
                    instances,
                    instance_count=target_instance_count,
                    iou_threshold=pre_cull_iou_threshold,
                )

        cleaner = None
        if clean_instance_count:
            cleaner = TrackCleaner(
                instance_count=clean_instance_count, iou_threshold=clean_iou_threshold
            )

        tracker_obj = cls(
            track_window=track_window,
            similarity_function=similarity_map[similarity],
            matching_function=matching_map[match],
            candidate_maker=candidate_maker,
            max_tracks=max_tracks,
            max_tracking=max_tracking,
            robust_best_instance=robust,
            min_new_track_points=min_new_track_points,
            target_instance_count=target_instance_count,
            pre_cull_function=pre_cull_function,
            post_connect_single_breaks=post_connect_single_breaks,
            cleaner=cleaner,
        )
        if kf_init_frame_count and kf_node_indices is not None:
            from sleap_tpu.tracking.kalman import KalmanTracker

            return KalmanTracker.make_tracker(
                init_tracker=tracker_obj,
                node_indices=list(kf_node_indices),
                instance_count=target_instance_count or (max_tracks or 2),
                init_frame_count=kf_init_frame_count,
            )
        return tracker_obj


@attr.s(auto_attribs=True)
class TrackCleaner:
    """Post-hoc cull to target count + reconnect breaks (tracking.py:1514)."""

    instance_count: int
    iou_threshold: Optional[float] = None

    def run(self, frames) -> None:
        from sleap_tpu.tracking.components import cull_instances

        cull_instances(frames, self.instance_count, self.iou_threshold)
        connect_single_track_breaks(frames, self.instance_count)


def run_tracker(frames, tracker: Tracker) -> List:
    """Apply a tracker over saved prediction frames (tracking.py:1542)."""
    for lf in frames:
        instances = [inst for inst in lf.instances if isinstance(inst, PredictedInstance)]
        for inst in instances:
            inst.track = None
        img = lf.image if tracker.uses_image else None
        lf.instances = tracker.track(
            untracked_instances=instances, img=img, t=lf.frame_idx
        )
    tracker.final_pass(frames)
    return frames


def retrack(labels, tracker: Tracker):
    """Re-run tracking over a saved predictions file (tracking.py:1583)."""
    frames = sorted(labels.labeled_frames, key=lambda lf: lf.frame_idx)
    run_tracker(frames, tracker)
    labels.tracks = list(
        {inst.track for lf in frames for inst in lf.instances if inst.track}
    )
    labels.update_cache()
    return labels


def main(args=None) -> None:
    """CLI: re-track saved predictions (reference ``python -m sleap.nn.tracking``)."""
    import argparse

    from sleap_tpu.core.labels import Labels

    parser = argparse.ArgumentParser(description="Run tracking on predictions.")
    parser.add_argument("data_path", help="Path to predictions (.slp).")
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--tracking.tracker", dest="tracker", default="flow")
    parser.add_argument("--tracking.similarity", dest="similarity", default="instance")
    parser.add_argument("--tracking.match", dest="match", default="greedy")
    parser.add_argument("--tracking.track_window", dest="track_window", type=int, default=5)
    parser.add_argument("--tracking.max_tracks", dest="max_tracks", type=int, default=None)
    parser.add_argument(
        "--tracking.kf_init_frame_count", dest="kf_init_frame_count",
        type=int, default=0,
        help="If >0, init Kalman filters from this many flow-tracked frames.",
    )
    parser.add_argument(
        "--tracking.kf_node_indices", dest="kf_node_indices", default=None,
        help="Comma-separated node indices the Kalman filters track.",
    )
    parser.add_argument(
        "--frames", default=None,
        help="Frame range to retrack, e.g. 0-100 (default: all).",
    )
    ns = parser.parse_args(args)

    labels = Labels.load_file(ns.data_path)
    if ns.frames:
        lo, _, hi = ns.frames.partition("-")
        lo, hi = int(lo), int(hi or lo)
        labels = Labels(
            [lf for lf in labels if lo <= lf.frame_idx <= hi]
        )
    kf_nodes = (
        [int(i) for i in ns.kf_node_indices.split(",")]
        if ns.kf_node_indices
        else None
    )
    tracker = Tracker.make_tracker_by_name(
        tracker=ns.tracker,
        similarity=ns.similarity,
        match=ns.match,
        track_window=ns.track_window,
        max_tracks=ns.max_tracks,
        kf_init_frame_count=ns.kf_init_frame_count,
        kf_node_indices=kf_nodes,
    )
    retrack(labels, tracker)
    out = ns.output or (ns.data_path + ".retracked.slp")
    labels.save(out)
    print(f"Saved: {out}")


if __name__ == "__main__":
    main()
