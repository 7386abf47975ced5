"""Labels: the project/dataset container.

Rebuild of ``/root/reference/sleap/io/dataset.py:389`` (``Labels``) with the
same surface: a sequence of :class:`LabeledFrame` plus registries of videos,
skeletons, tracks, and labeling suggestions, with fast frame lookup indices
(the reference's ``LabelsDataCache``, dataset.py:97).
"""

from __future__ import annotations

import os
from collections.abc import MutableSequence
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple, Union

import attr
import numpy as np

from sleap_tpu.core.instance import (
    Instance,
    LabeledFrame,
    PredictedInstance,
    Track,
    empty_points,
)
from sleap_tpu.core.skeleton import Node, Skeleton
from sleap_tpu.io.video import Video


@attr.s(auto_attribs=True, eq=False)
class SuggestionFrame:
    """A frame suggested for labeling (reference dataset.py suggestions)."""

    video: Video
    frame_idx: int
    group: Optional[int] = None


class Labels(MutableSequence):
    """Dataset of labeled frames plus shared metadata registries."""

    def __init__(
        self,
        labeled_frames: Optional[List[LabeledFrame]] = None,
        videos: Optional[List[Video]] = None,
        skeletons: Optional[List[Skeleton]] = None,
        tracks: Optional[List[Track]] = None,
        suggestions: Optional[List[SuggestionFrame]] = None,
        negative_anchors: Optional[Dict[Video, list]] = None,
        provenance: Optional[Dict[str, Any]] = None,
    ):
        self.labeled_frames: List[LabeledFrame] = list(labeled_frames or [])
        self.videos: List[Video] = list(videos or [])
        self.skeletons: List[Skeleton] = list(skeletons or [])
        self.tracks: List[Track] = list(tracks or [])
        self.suggestions: List[SuggestionFrame] = list(suggestions or [])
        self.negative_anchors: Dict[Video, list] = negative_anchors or {}
        self.provenance: Dict[str, Any] = provenance or {}
        self._update_registries()
        self._rebuild_cache()

    # ------------------------------------------------------------------ #
    # Cache / registries
    # ------------------------------------------------------------------ #
    def _update_registries(self) -> None:
        """Collect videos/skeletons/tracks referenced by frames."""
        for lf in self.labeled_frames:
            if lf.video is not None and lf.video not in self.videos:
                self.videos.append(lf.video)
            for inst in lf.instances:
                if inst.skeleton is not None and inst.skeleton not in self.skeletons:
                    self.skeletons.append(inst.skeleton)
                if inst.track is not None and inst.track not in self.tracks:
                    self.tracks.append(inst.track)

    def _rebuild_cache(self) -> None:
        self._lf_by_video: Dict[int, Dict[int, LabeledFrame]] = {}
        for lf in self.labeled_frames:
            self._lf_by_video.setdefault(id(lf.video), {})[lf.frame_idx] = lf

    def update_cache(self) -> None:
        self._update_registries()
        self._rebuild_cache()

    # ------------------------------------------------------------------ #
    # MutableSequence interface
    # ------------------------------------------------------------------ #
    def __len__(self) -> int:
        return len(self.labeled_frames)

    def __getitem__(self, key, *secondary_key):
        """Safe indexing (reference dataset.py:636): delegates to :meth:`get`
        without kwargs, so missing lookups return ``None`` rather than raise
        (except plain out-of-range ints, which raise IndexError so sequence
        iteration terminates)."""
        return self.get(key, *secondary_key)

    def __setitem__(self, i: int, value: LabeledFrame) -> None:
        self.labeled_frames[i] = value
        self.update_cache()

    def __delitem__(self, i: int) -> None:
        del self.labeled_frames[i]
        self.update_cache()

    def __contains__(self, item) -> bool:
        """Membership across frames/videos/skeletons/nodes and
        ``(Video, frame_idx)`` pairs (reference dataset.py:609)."""
        if isinstance(item, LabeledFrame):
            return item in self.labeled_frames
        if isinstance(item, Video):
            return item in self.videos
        if isinstance(item, Skeleton):
            return item in self.skeletons
        if isinstance(item, Node):
            return any(item in skel.nodes for skel in self.skeletons)
        if (
            isinstance(item, tuple)
            and len(item) == 2
            and isinstance(item[0], Video)
            and isinstance(item[1], (int, np.integer))
        ):
            return bool(self.find(video=item[0], frame_idx=int(item[1])))
        raise ValueError("Item is not an object type contained in labels.")

    def insert(self, index: int, value: LabeledFrame) -> None:
        """Insert a frame unless that frame — or another frame at the same
        ``(video, frame_idx)`` — is already present (reference
        dataset.py:867)."""
        if value in self.labeled_frames:
            return
        if (
            value.video is not None
            and value.frame_idx is not None
            and (value.video, int(value.frame_idx)) in self
        ):
            return
        self.labeled_frames.insert(index, value)
        self._register_frame(value)

    def append(self, value: LabeledFrame) -> None:
        """Add a frame (no-op on ``(video, frame_idx)`` duplicates, like the
        reference's append -> insert path, dataset.py:875)."""
        self.insert(len(self.labeled_frames), value)

    def _register_frame(self, value: LabeledFrame) -> None:
        if value.video is not None and value.video not in self.videos:
            self.videos.append(value.video)
        for inst in value.instances:
            if inst.skeleton not in self.skeletons:
                self.skeletons.append(inst.skeleton)
            if inst.track is not None and inst.track not in self.tracks:
                self.tracks.append(inst.track)
        self._lf_by_video.setdefault(id(value.video), {})[value.frame_idx] = value

    def extend(self, values: Iterable[LabeledFrame]) -> None:
        for v in values:
            self.append(v)

    def extend_from(
        self,
        new_frames: Union["Labels", List[LabeledFrame]],
        unify: bool = False,
    ) -> bool:
        """Merge frames from another :class:`Labels` or frame list (reference
        dataset.py:1593). With ``unify``, videos and skeletons in the new
        frames are replaced by matching objects already in this project
        (matched by filename / node names) before merging; frames landing on
        an existing (video, frame_idx) are merged into that frame.
        """
        if isinstance(new_frames, Labels):
            new_frames = new_frames.labeled_frames
        if not isinstance(new_frames, list) or not new_frames:
            return False
        if not isinstance(new_frames[0], LabeledFrame):
            return False
        incoming = Labels(labeled_frames=list(new_frames))
        if unify and self.labeled_frames:
            by_key = {_video_match_key(v): v for v in self.videos}
            by_key.pop(None, None)
            for lf in incoming.labeled_frames:
                match = by_key.get(_video_match_key(lf.video))
                if match is not None:
                    lf.video = match
            _unify_skeletons(self, incoming)
        self.labeled_frames.extend(incoming.labeled_frames)
        self.merge_matching_frames()
        self.update_cache()
        return True

    # ------------------------------------------------------------------ #
    # Lookup
    # ------------------------------------------------------------------ #
    def find(
        self,
        video: Video,
        frame_idx: Optional[Union[int, Iterable[int]]] = None,
        return_new: bool = False,
    ) -> List[LabeledFrame]:
        """Frames in ``video`` (optionally at specific indices).

        Reference analog: dataset.py:933.
        """
        by_idx = self._lf_by_video.get(id(video), {})
        if frame_idx is None:
            return sorted(by_idx.values(), key=lambda lf: lf.frame_idx)
        if np.isscalar(frame_idx):
            frame_idx = [int(frame_idx)]
        out = []
        for fi in frame_idx:
            fi = int(fi)
            if fi in by_idx:
                out.append(by_idx[fi])
            elif return_new:
                out.append(LabeledFrame(video=video, frame_idx=fi))
        return out

    def find_first(
        self, video: Video, frame_idx: Optional[int] = None, use_cache: bool = True
    ) -> Optional[LabeledFrame]:
        out = self.find(video, frame_idx)
        return out[0] if out else None

    def find_last(self, video: Video, frame_idx: Optional[int] = None) -> Optional[LabeledFrame]:
        out = self.find(video, frame_idx)
        return out[-1] if out else None

    def frames(self, video: Video, from_frame_idx: int = -1, reverse: bool = False):
        """Iterate ALL of a video's frames, rotated to start just after
        (before, if ``reverse``) ``from_frame_idx`` and wrapping around —
        the reference's ``find_fancy_frame_idxs`` semantics
        (dataset.py:963, cache find_fancy_frame_idxs:158)."""
        frames = self.find(video)
        if not frames:
            return
        idxs = [f.frame_idx for f in frames]
        if reverse:
            start = max(
                (i for i in idxs if i < from_frame_idx), default=idxs[-1]
            )
        else:
            start = min(
                (i for i in idxs if i > from_frame_idx), default=idxs[0]
            )
        cut = idxs.index(start)
        yield from frames[cut:] + frames[:cut]

    def get(
        self,
        key,
        *secondary_key,
        use_cache: bool = False,
        raise_errors: bool = False,
    ):
        """Frame lookup matching the reference's ``Labels.get``
        (dataset.py:676): int/slice/list/array linear indexing, ``Video`` or
        ``(Video, frame_idx)`` search, ``None`` on missing keys unless
        ``raise_errors``. ``use_cache`` selects the cached index over a
        linear scan (both give identical results here; kept for API parity).
        """
        try:
            if secondary_key:
                if not isinstance(key, tuple):
                    key = (key,)
                key = key + tuple(secondary_key)

            if isinstance(key, slice):
                key = range(*key.indices(len(self)))
            elif isinstance(key, (np.integer, np.ndarray)):
                key = key.tolist()

            if isinstance(key, int):
                return self.labeled_frames[key]
            if isinstance(key, Video):
                if key not in self.videos:
                    raise KeyError("Video not found in labels.")
                return self.find(video=key)
            if isinstance(key, tuple) and len(key) == 2 and isinstance(key[0], Video):
                if key[0] not in self.videos:
                    raise KeyError("Video not found in labels.")
                if isinstance(key[1], (np.integer, np.ndarray)):
                    key = (key[0], key[1].tolist())
                if isinstance(key[1], int):
                    hit = self.find_first(
                        video=key[0], frame_idx=key[1], use_cache=use_cache
                    )
                    if hit is None:
                        raise KeyError(
                            f"No label found for specified video at frame {key[1]}."
                        )
                    return hit
                if isinstance(key[1], (list, range)):
                    return self.find(video=key[0], frame_idx=key[1])
                raise KeyError("Invalid label indexing arguments.")
            if isinstance(key, (list, range)):
                return [self.get(int(i), raise_errors=True) for i in key]
            raise KeyError("Invalid label indexing arguments.")
        except KeyError:
            if raise_errors:
                raise
            return None

    # ------------------------------------------------------------------ #
    # Views
    # ------------------------------------------------------------------ #
    @property
    def user_labeled_frames(self) -> List[LabeledFrame]:
        return [lf for lf in self.labeled_frames if lf.has_user_instances]

    @property
    def predicted_frames(self) -> List[LabeledFrame]:
        return [lf for lf in self.labeled_frames if lf.has_predicted_instances]

    @property
    def all_instances(self) -> List[Instance]:
        return [inst for lf in self.labeled_frames for inst in lf.instances]

    @property
    def user_instances(self) -> List[Instance]:
        return [inst for lf in self.labeled_frames for inst in lf.user_instances]

    @property
    def predicted_instances(self) -> List[PredictedInstance]:
        return [inst for lf in self.labeled_frames for inst in lf.predicted_instances]

    @property
    def labels(self) -> List[LabeledFrame]:
        """Alias for ``labeled_frames`` (reference dataset.py:553)."""
        return self.labeled_frames

    @property
    def skeleton(self) -> Skeleton:
        """The single skeleton; raises if ambiguous (reference
        dataset.py:558)."""
        if len(self.skeletons) == 1:
            return self.skeletons[0]
        raise ValueError(
            "Labels.skeleton can only be used when there is only a single "
            "skeleton saved in the labels. Use Labels.skeletons instead."
        )

    @property
    def video(self) -> Video:
        """The single video; raises if none or ambiguous (reference
        dataset.py:569)."""
        if len(self.videos) == 0:
            raise ValueError("There are no videos in the labels.")
        if len(self.videos) == 1:
            return self.videos[0]
        raise ValueError(
            "Labels.video can only be used when there is only a single video "
            "saved in the labels. Use Labels.videos instead."
        )

    @property
    def has_missing_videos(self) -> bool:
        return any(v.is_missing for v in self.videos)

    def instance_count(self, video: Video, frame_idx: int) -> int:
        lf = self.find_first(video, frame_idx)
        return len(lf.instances) if lf is not None else 0

    def get_track_occupancy(self, video: Video) -> Dict[Track, "RangeList"]:
        """Per-track RangeList of (start, end_exclusive) frame ranges
        (reference dataset.py ``get_track_occupancy`` returns RangeList)."""
        from sleap_tpu.core.rangelist import RangeList

        occupancy: Dict[Track, List[int]] = {}
        for lf in self.find(video):
            for inst in lf.instances:
                if inst.track is not None:
                    occupancy.setdefault(inst.track, []).append(lf.frame_idx)
        out = {}
        for track, idxs in occupancy.items():
            idxs = sorted(set(idxs))
            ranges, start, prev = [], idxs[0], idxs[0]
            for i in idxs[1:]:
                if i == prev + 1:
                    prev = i
                else:
                    ranges.append((start, prev + 1))
                    start = prev = i
            ranges.append((start, prev + 1))
            out[track] = RangeList(ranges)
        return out

    # ------------------------------------------------------------------ #
    # Mutation
    # ------------------------------------------------------------------ #
    def add_video(self, video: Video) -> None:
        if video not in self.videos:
            self.videos.append(video)

    def remove_video(self, video: Video) -> None:
        self.labeled_frames = [lf for lf in self.labeled_frames if lf.video is not video]
        self.suggestions = [s for s in self.suggestions if s.video is not video]
        if video in self.videos:
            self.videos.remove(video)
        self.update_cache()

    def add_track(self, video: Video, track: Track) -> None:
        if track not in self.tracks:
            self.tracks.append(track)

    # ------------------------------------------------------------------ #
    # Instance / track editing (reference dataset.py:1156-1380)
    # ------------------------------------------------------------------ #
    def instances(self, video: Optional[Video] = None, skeleton=None):
        """Iterate over instances, optionally filtered by video/skeleton."""
        for lf in self.labeled_frames:
            if video is None or lf.video == video:
                for inst in lf.instances:
                    if skeleton is None or inst.skeleton == skeleton:
                        yield inst

    def has_frame(
        self,
        lf: Optional[LabeledFrame] = None,
        video: Optional[Video] = None,
        frame_idx: Optional[int] = None,
        use_cache: bool = True,
    ) -> bool:
        """True if a frame with this video + frame index exists (reference
        dataset.py:1636; matches on identity of (video, frame_idx), not
        instance contents)."""
        if lf is not None:
            video, frame_idx = lf.video, lf.frame_idx
        if video is None or frame_idx is None:
            raise ValueError("Either lf or both video and frame_idx required.")
        if use_cache:
            return int(frame_idx) in self._lf_by_video.get(id(video), {})
        return any(
            f.video == video and f.frame_idx == frame_idx
            for f in self.labeled_frames
        )

    def add_instance(self, frame: LabeledFrame, instance: Instance) -> None:
        """Add instance to frame, registering its track (reference
        dataset.py:1325; an existing USER instance on the same track in the
        frame clears the new instance's track)."""
        tracks_in_frame = [
            inst.track
            for inst in frame.instances
            if type(inst) is Instance and inst.track is not None
        ]
        if instance.track in tracks_in_frame:
            instance.track = None
        frame.instances.append(instance)
        instance.frame = frame
        if instance.track is not None and instance.track not in self.tracks:
            self.add_track(frame.video, instance.track)
        if frame not in self.labeled_frames:
            self.append(frame)

    def remove_instance(self, frame: LabeledFrame, instance: Instance) -> None:
        """Remove instance from frame (reference dataset.py:1317)."""
        frame.remove_instance(instance)

    def remove_track(self, track: Track) -> None:
        """Remove a track, clearing it from (but keeping) instances."""
        for inst in self.instances():
            if inst.track == track:
                inst.track = None
        if track in self.tracks:
            self.tracks.remove(track)

    def remove_all_tracks(self) -> None:
        for inst in self.instances():
            inst.track = None
        self.tracks = []

    def remove_unused_tracks(self) -> None:
        used = {inst.track for inst in self.instances()}
        self.tracks = [t for t in self.tracks if t in used]

    def find_track_occupancy(
        self, video: Video, track: Union[Track, int], frame_range=None
    ) -> List[Instance]:
        """Instances on ``track`` in ``video`` (reference dataset.py:1345).

        ``track`` may be a Track or an int "pseudo-track": the index into the
        frame's instance list, matching only untracked instances.
        """
        if isinstance(frame_range, tuple):
            frame_range = range(*frame_range)

        def matches(inst, lf):
            if isinstance(track, Track):
                return inst.track is track
            return (
                isinstance(track, int)
                and lf.instances.index(inst) == track
                and inst.track is None
            )

        return [
            inst
            for lf in self.find(video)
            if frame_range is None or lf.frame_idx in frame_range
            for inst in lf.instances
            if matches(inst, lf)
        ]

    def track_swap(
        self,
        video: Video,
        new_track: Track,
        old_track: Optional[Union[Track, int]],
        frame_range: tuple,
    ) -> None:
        """Swap instances between two tracks over a frame range (reference
        dataset.py:1277). An int ``old_track`` is a pseudo-track (instance
        list index); its instances move to ``new_track`` one-way."""
        old_insts = self.find_track_occupancy(video, old_track, frame_range)
        new_insts = self.find_track_occupancy(video, new_track, frame_range)
        for inst in old_insts:
            inst.track = new_track
        if isinstance(old_track, Track):
            for inst in new_insts:
                inst.track = old_track

    def track_set_instance(
        self, frame: LabeledFrame, instance: Instance, new_track: Track
    ) -> None:
        """Assign ``new_track`` to ``instance``, swapping any existing
        occupant of that track in the frame (reference dataset.py:1262)."""
        self.track_swap(
            frame.video,
            new_track,
            instance.track,
            (frame.frame_idx, frame.frame_idx + 1),
        )
        instance.track = new_track
        if new_track not in self.tracks:
            self.add_track(frame.video, new_track)

    def get_track_count(self, video: Video) -> int:
        """Number of occupied tracks in ``video``."""
        return len(self.get_track_occupancy(video))

    @property
    def user_labeled_frame_inds(self) -> List[int]:
        return [
            i
            for i, lf in enumerate(self.labeled_frames)
            if lf.has_user_instances
        ]

    def get_labeled_frame_count(
        self, video: Optional[Video] = None, filter: str = ""
    ) -> int:
        """Count frames, optionally only those with user/predicted instances
        (reference dataset.py:1077)."""
        if filter not in ("", "user", "predicted"):
            raise ValueError(f"invalid filter: {filter!r}")
        count = 0
        for lf in self.labeled_frames:
            if video is not None and lf.video != video:
                continue
            if filter == "user" and not lf.has_user_instances:
                continue
            if filter == "predicted" and not lf.has_predicted_instances:
                continue
            count += 1
        return count

    get_frame_count = get_labeled_frame_count

    @property
    def max_user_instances(self) -> int:
        return max((lf.n_user_instances for lf in self.labeled_frames), default=0)

    @property
    def min_user_instances(self) -> Optional[int]:
        return min(
            (lf.n_user_instances for lf in self.labeled_frames), default=None
        )

    @property
    def is_multi_instance(self) -> bool:
        """True if any frame has multiple user instances (reference
        dataset.py:1131)."""
        return self.max_user_instances > 1

    @classmethod
    def make_video_callback(cls, search_paths: Optional[List[str]] = None, **_) -> List[str]:
        """Missing-video resolution hint for :meth:`load_file` (reference
        dataset.py:2601 returns a GUI-capable callback; here the search-path
        list itself is the accepted ``video_search`` value)."""
        return list(search_paths or [])

    @classmethod
    def complex_merge_between(
        cls, base_labels: "Labels", new_labels: "Labels", unify: bool = True
    ) -> Tuple[Dict, List[LabeledFrame], List[LabeledFrame]]:
        """Conflict-aware merge (reference dataset.py:1767): everything that
        merges cleanly lands in ``base_labels``; frames where BOTH sides have
        unmatched same-kind instances come back as conflict frame lists for
        the caller to resolve via :meth:`finish_complex_merge`.

        With ``unify`` (default), videos in ``new_labels`` are first remapped
        to matching base videos (same identifying filename) in place.
        """
        if unify:
            by_key = {}
            for v in base_labels.videos:
                for key in _video_match_keys(v):
                    by_key.setdefault(key, v)

            def _find_base_video(video):
                for key in _video_match_keys(video):
                    match = by_key.get(key)
                    if match is not None:
                        return match
                return None

            for lf in new_labels.labeled_frames:
                match = _find_base_video(lf.video)
                if match is not None:
                    lf.video = match
            for s in new_labels.suggestions:
                match = _find_base_video(s.video)
                if match is not None:
                    s.video = match
            _unify_skeletons(base_labels, new_labels)
        merged, extra_base, extra_new = LabeledFrame.complex_merge_between(
            base_labels, new_labels.labeled_frames
        )
        if not extra_base and not extra_new:
            base_labels.update_cache()
        base_labels.suggestions.extend(new_labels.suggestions)
        return merged, extra_base, extra_new

    @staticmethod
    def finish_complex_merge(
        base_labels: "Labels", resolved_frames: List[LabeledFrame]
    ) -> None:
        """Apply resolved conflict frames after :meth:`complex_merge_between`
        (reference dataset.py:1830)."""
        base_labels.labeled_frames.extend(resolved_frames)
        base_labels.merge_matching_frames()
        base_labels.update_cache()

    def merge_nodes(self, base_node: str, merge_node: str) -> None:
        """Merge ``merge_node`` into ``base_node`` project-wide (reference
        dataset.py:2561): each instance keeps the base point if it has data,
        else takes the merged node's point; the merged node is then deleted
        from the skeleton and every instance's point array."""
        for inst in self.instances():
            names = inst.skeleton.node_names
            if base_node not in names or merge_node not in names:
                continue
            inst._merge_nodes_data(base_node, merge_node)
            # (row removal happens automatically when the node is deleted:
            # Instance.points realigns to the skeleton by node identity)
        for skel in self.skeletons:
            if base_node in skel.node_names and merge_node in skel.node_names:
                skel.delete_node(merge_node)

    def copy(self) -> "Labels":
        """Deep copy of frames/instances; videos AND tracks shared (videos
        hold live decoder handles; sharing tracks keeps instance.track
        identity consistent with the copied registry)."""
        import copy as _copy

        memo = {id(v): v for v in self.videos}
        memo.update({id(t): t for t in self.tracks})
        lfs = _copy.deepcopy(self.labeled_frames, memo)
        new = Labels(labeled_frames=lfs, provenance=dict(self.provenance))
        new.tracks = list(self.tracks)
        new.suggestions = list(self.suggestions)
        return new

    # ------------------------------------------------------------------ #
    # Suggestions API (reference dataset.py:1385-1480)
    # ------------------------------------------------------------------ #
    def add_suggestion(self, video: Video, frame_idx: int) -> None:
        for s in self.suggestions:
            if s.video == video and s.frame_idx == frame_idx:
                return
        self.suggestions.append(SuggestionFrame(video=video, frame_idx=frame_idx))

    def remove_suggestion(self, video: Video, frame_idx: int) -> None:
        for s in self.suggestions:
            if s.video == video and s.frame_idx == frame_idx:
                self.suggestions.remove(s)
                return

    def clear_suggestions(self) -> None:
        self.suggestions = []

    def get_suggestions(self) -> List[SuggestionFrame]:
        return self.suggestions

    def set_suggestions(self, suggestions: List[SuggestionFrame]) -> None:
        self.suggestions = list(suggestions)

    def append_suggestions(self, suggestions: List[SuggestionFrame]) -> None:
        self.suggestions.extend(suggestions)

    def find_suggestion(self, video: Video, frame_idx: int):
        for s in self.suggestions:
            if s.video == video and s.frame_idx == frame_idx:
                return s
        return None

    def get_video_suggestions(
        self, video: Video, user_labeled: bool = True
    ) -> List[int]:
        """Suggested frame indices for ``video``; with ``user_labeled=False``
        suggestions that already have user labels are omitted."""
        out = []
        for s in self.suggestions:
            if s.video != video:
                continue
            if not user_labeled:
                lf = self.find(video, s.frame_idx)
                if lf and lf[0].has_user_instances:
                    continue
            out.append(s.frame_idx)
        return out

    @property
    def unlabeled_suggestions(self) -> List[SuggestionFrame]:
        """Suggestions whose frame has no user instances."""
        out = []
        for s in self.suggestions:
            lf = self.find(s.video, s.frame_idx)
            if not lf or not lf[0].has_user_instances:
                out.append(s)
        return out

    def get_unlabeled_suggestion_inds(self) -> List[int]:
        unlabeled = set(map(id, self.unlabeled_suggestions))
        return [i for i, s in enumerate(self.suggestions) if id(s) in unlabeled]

    def get_next_suggestion(self, video: Video, frame_idx: int, seek_direction: int = 1):
        """Next/previous suggestion from a position (reference
        dataset.py:1449): follows list order when currently on a suggestion,
        otherwise seeks by frame order, wrapping across videos."""
        if seek_direction not in (-1, 1):
            raise ValueError("seek_direction should be -1 or 1.")
        if video not in self.videos or not self.suggestions:
            return None
        match = self.find_suggestion(video, frame_idx)
        if match is not None:
            idx = self.suggestions.index(match)
            return self.suggestions[(idx + seek_direction) % len(self.suggestions)]
        vid_inds = self.get_video_suggestions(video)
        if seek_direction == 1:
            cand = min((i for i in vid_inds if i > frame_idx), default=None)
        else:
            cand = max((i for i in vid_inds if i < frame_idx), default=None)
        if cand is not None:
            return self.find_suggestion(video, cand)
        # Wrap: earliest (or latest) suggestion of the next video in
        # self.videos order (reference dataset.py:1483-1495).
        next_video = self.videos[
            (self.videos.index(video) + seek_direction) % len(self.videos)
        ]
        inds = self.get_video_suggestions(next_video)
        if not inds:
            return None
        target = min(inds) if seek_direction == 1 else max(inds)
        return self.find_suggestion(next_video, target)

    def remove_frame(self, lf: LabeledFrame) -> None:
        self.labeled_frames.remove(lf)
        self.update_cache()

    def remove_frames(self, lfs: List[LabeledFrame]) -> None:
        lf_set = set(id(lf) for lf in lfs)
        self.labeled_frames = [lf for lf in self.labeled_frames if id(lf) not in lf_set]
        self.update_cache()

    def remove_empty_frames(self) -> None:
        self.labeled_frames = [lf for lf in self.labeled_frames if len(lf.instances) > 0]
        self.update_cache()

    def remove_empty_instances(self, keep_empty_frames: bool = True) -> None:
        """Remove instances with no visible points (reference
        dataset.py:909)."""
        for lf in self.labeled_frames:
            lf.remove_empty_instances()
        self.update_cache()
        if not keep_empty_frames:
            self.remove_empty_frames()

    def remove_user_instances(self, new_labels: Optional["Labels"] = None) -> None:
        """Clear user instances; frames left with no predictions are dropped.
        With ``new_labels``, only frames that also exist there are touched
        (reference dataset.py:1682)."""
        keep_lfs = []
        for lf in self.labeled_frames:
            if new_labels is not None and not new_labels.has_frame(lf):
                keep_lfs.append(lf)
                continue
            if lf.has_predicted_instances:
                lf.instances = lf.predicted_instances
                keep_lfs.append(lf)
        self.labeled_frames = keep_lfs
        self.update_cache()

    def remove_predictions(self, new_labels: Optional["Labels"] = None) -> None:
        """Clear predicted instances; frames left with no user instances are
        dropped. With ``new_labels``, only frames that also exist there are
        touched (reference dataset.py:1718)."""
        keep_lfs = []
        for lf in self.labeled_frames:
            if new_labels is not None and not new_labels.has_frame(lf):
                keep_lfs.append(lf)
                continue
            if lf.has_user_instances:
                lf.instances = lf.user_instances
                keep_lfs.append(lf)
        self.labeled_frames = keep_lfs
        self.update_cache()

    def remove_untracked_instances(self, remove_empty_frames: bool = True) -> None:
        for lf in self.labeled_frames:
            lf.remove_untracked()
        if remove_empty_frames:
            self.remove_empty_frames()

    def merge_matching_frames(self) -> None:
        """Combine identical (video, frame_idx) frames into one."""
        merged: Dict[Tuple[int, int], LabeledFrame] = {}
        order = []
        for lf in self.labeled_frames:
            key = (id(lf.video), lf.frame_idx)
            if key in merged:
                for inst in lf.instances:
                    merged[key].insert_instance(inst)
            else:
                merged[key] = lf
                order.append(key)
        self.labeled_frames = [merged[k] for k in order]
        self.update_cache()

    # ------------------------------------------------------------------ #
    # Splitting / extraction
    # ------------------------------------------------------------------ #
    def extract(self, inds: Iterable[int], copy: bool = False) -> "Labels":
        """New Labels with the selected frames (shared objects unless copy).

        Videos are always shared (they hold live decoder resources — locks,
        file handles — that must not be duplicated).
        """
        lfs = [self.labeled_frames[int(i)] for i in inds]
        if copy:
            import copy as _copy

            memo = {id(v): v for v in self.videos}
            lfs = _copy.deepcopy(lfs, memo)
        return Labels(
            labeled_frames=lfs,
            provenance=dict(self.provenance),
        )

    def split(
        self, n: Union[int, float], copy: bool = True, seed: Optional[int] = None
    ) -> Tuple["Labels", "Labels"]:
        """Random split into two Labels (reference dataset.py:820)."""
        n_total = len(self)
        if isinstance(n, float):
            n1 = max(int(round(n_total * n)), 1)
        else:
            n1 = n
        n1 = min(n1, n_total - 1) if n_total > 1 else 1
        rng = np.random.default_rng(seed)
        idx = rng.permutation(n_total)
        if n_total == 1:
            return self.extract([0], copy=copy), self.extract([0], copy=copy)
        return (
            self.extract(sorted(idx[:n1]), copy=copy),
            self.extract(sorted(idx[n1:]), copy=copy),
        )

    def with_user_labels_only(
        self,
        user_instances_only: bool = True,
        with_track_only: bool = False,
        copy: bool = True,
    ) -> "Labels":
        inds = [i for i, lf in enumerate(self.labeled_frames) if lf.has_user_instances]
        new = self.extract(inds, copy=copy)
        for lf in new.labeled_frames:
            if user_instances_only:
                lf.instances = lf.user_instances
            if with_track_only:
                lf.instances = lf.tracked_instances
        new.update_cache()
        return new

    # ------------------------------------------------------------------ #
    # Numpy export (tracked occupancy matrix)
    # ------------------------------------------------------------------ #
    def numpy(
        self,
        video: Optional[Union[Video, int]] = None,
        all_frames: bool = True,
        untracked: bool = False,
        return_confidence: bool = False,
    ) -> np.ndarray:
        """(frames, tracks, nodes, 2) float32 array of instance points; with
        ``return_confidence`` the last axis is 3 (x, y, point score).

        Reference semantics (dataset.py:2442): ``video`` may be a Video or
        an index (default: first video); with ``all_frames`` the array spans
        the FULL video length, else the labeled range. Frames with user
        instances export ONLY those (user preferred over predictions).
        Single-instance data is exported untracked automatically. User
        instances have NaN confidence.
        """
        try:
            if video is None:
                video = self.videos[0]
            if isinstance(video, int):
                video = self.videos[video]
        except IndexError:
            raise IndexError(
                "There are no videos in this project. No points matrix to "
                "return."
            )
        lfs = self.find(video)
        n_cols = 3 if return_confidence else 2
        if not lfs:
            return np.zeros((0, 0, 0, n_cols), dtype="float32")
        frame_idxs = sorted(lf.frame_idx for lf in lfs)
        first_frame = 0 if all_frames else frame_idxs[0]
        last_frame = (video.num_frames - 1) if all_frames else frame_idxs[-1]
        n_insts = max(
            lf.n_user_instances if lf.n_user_instances > 0
            else lf.n_predicted_instances
            for lf in lfs
        )
        untracked = untracked or n_insts == 1
        n_tracks = n_insts if untracked else len(self.tracks)
        n_frames = last_frame - first_frame + 1
        n_nodes = self.skeleton.n_nodes
        out = np.full(
            (n_frames, n_tracks, n_nodes, n_cols), np.nan, dtype="float32"
        )

        def fill(fi, j, inst):
            out[fi, j, :, :2] = inst.numpy()
            if return_confidence and isinstance(inst, PredictedInstance):
                out[fi, j, :, 2] = inst.scores

        for lf in lfs:
            fi = lf.frame_idx - first_frame
            lf_insts = (
                lf.user_instances
                if lf.n_user_instances > 0
                else lf.predicted_instances
            )
            if untracked:
                for j, inst in enumerate(lf_insts[:n_tracks]):
                    fill(fi, j, inst)
            else:
                for inst in lf_insts:
                    if inst.track is None:
                        continue
                    fill(fi, self.tracks.index(inst.track), inst)
        return out

    def describe(self) -> None:
        """Print basic statistics about the dataset (reference dataset.py:1135)."""
        print(f"Skeleton: {self.skeleton}")
        print(f"Videos: {[v.filename for v in self.videos]}")
        n_user = n_pred = n_user_inst = n_pred_inst = 0
        for lf in self.labeled_frames:
            user = lf.user_instances
            pred = lf.predicted_instances
            if user:
                n_user += 1
                n_user_inst += len(user)
            if pred:
                n_pred += 1
                n_pred_inst += len(pred)
        print(f"Frames (user/predicted): {n_user:,}/{n_pred:,}")
        print(f"Instances (user/predicted): {n_user_inst:,}/{n_pred_inst:,}")
        print("Tracks:", self.tracks)
        print(f"Suggestions: {len(self.suggestions):,}")
        print("Provenance:", self.provenance)

    # ------------------------------------------------------------------ #
    # Analysis exports (reference dataset.py:2035-2106)
    # ------------------------------------------------------------------ #
    def export(self, filename: str) -> None:
        """Export to the analysis HDF5 format (node/track names, tracks
        matrix, occupancy)."""
        from sleap_tpu.info.write_tracking_h5 import export_analysis_file

        export_analysis_file(self, filename, all_frames=True)

    # (export_csv / export_nwb / export_nix are attached after the class
    # body from the module-level _labels_export_* implementations.)

    # ------------------------------------------------------------------ #
    # I/O
    # ------------------------------------------------------------------ #
    def save(
        self,
        filename: str,
        with_images: bool = False,
        embed_all_labeled: bool = False,
        embed_suggested: bool = False,
        **kwargs,
    ) -> None:
        from sleap_tpu.io import slp

        parent = os.path.dirname(filename)
        if parent:
            os.makedirs(parent, exist_ok=True)  # reference test_makedirs
        slp.write_labels(
            filename, self, save_frame_data=with_images,
            all_labeled=embed_all_labeled, suggested=embed_suggested, **kwargs
        )

    def to_dict(self, skip_labels: bool = False) -> Dict[str, Any]:
        """Serialize to a primitive dict (reference dataset.py:1875): the
        legacy JSON project structure with a shared ``nodes`` list, skeletons
        referencing nodes by index, and frames/instances referencing videos,
        skeletons, and tracks by index. Readable by
        :mod:`sleap_tpu.io.formats.labels_json`.
        """
        all_nodes: List[Node] = []
        for skel in self.skeletons:
            for node in skel.nodes:
                if node not in all_nodes:
                    all_nodes.append(node)
        node_to_idx = {node: i for i, node in enumerate(all_nodes)}
        d: Dict[str, Any] = {
            "version": "2.0.0",
            "skeletons": [s.to_dict(node_to_idx) for s in self.skeletons],
            "nodes": [{"name": n.name, "weight": n.weight} for n in all_nodes],
            "videos": [v.to_dict() for v in self.videos],
            "tracks": [
                {"spawned_on": t.spawned_on, "name": t.name} for t in self.tracks
            ],
            "suggestions": [
                {"video": str(self.videos.index(s.video)), "frame_idx": s.frame_idx}
                for s in self.suggestions
                if s.video in self.videos
            ],
            "negative_anchors": {},
            "provenance": dict(self.provenance),
        }
        if not skip_labels:
            d["labels"] = [self._frame_to_dict(lf) for lf in self.labeled_frames]
        return d

    def _frame_to_dict(self, lf: LabeledFrame) -> Dict[str, Any]:
        insts = []
        for inst in lf.instances:
            pts = inst.points
            points_d = {}
            for i in range(len(pts)):
                if np.isnan(pts[i]["x"]) and np.isnan(pts[i]["y"]):
                    continue
                pd = {
                    "x": float(pts[i]["x"]),
                    "y": float(pts[i]["y"]),
                    "visible": bool(pts[i]["visible"]),
                    "complete": bool(pts[i]["complete"]),
                }
                if inst.predicted:
                    pd["score"] = float(pts[i]["score"])
                points_d[str(i)] = pd
            inst_d: Dict[str, Any] = {
                "skeleton": self.skeletons.index(inst.skeleton)
                if inst.skeleton in self.skeletons
                else 0,
                "track": self.tracks.index(inst.track)
                if inst.track in self.tracks
                else None,
                "_points": points_d,
            }
            if inst.predicted:
                inst_d["score"] = float(inst.score)
            insts.append(inst_d)
        return {
            "video": str(self.videos.index(lf.video)),
            "frame_idx": lf.frame_idx,
            "_instances": insts,
        }

    @staticmethod
    def save_file(labels: "Labels", filename: str, **kwargs) -> None:
        """Reference-compatible saver (reference dataset.py ``save_file`` is a
        plain function, so both ``labels.save_file(fn)`` and
        ``Labels.save_file(labels=..., filename=...)`` call styles work)."""
        labels.save(filename, **kwargs)

    @classmethod
    def save_hdf5(cls, labels: "Labels" = None, filename: str = None, **kwargs):
        """Reference-compatible static saver (reference dataset.py
        Labels.save_hdf5; keyword order follows the reference's
        ``save_hdf5(filename=..., labels=...)`` call sites)."""
        labels.save(filename, **kwargs)

    @classmethod
    def load_hdf5(cls, filename: str, **kwargs) -> "Labels":
        return cls.load_file(filename, **kwargs)

    def _frame_data_nums(
        self, video, all_labeled: bool, suggested: bool, user_labeled: bool = True
    ):
        nums = {
            lf.frame_idx
            for lf in self.find(video)
            if all_labeled or (user_labeled and lf.has_user_instances)
        }
        if suggested:
            nums.update(
                s.frame_idx for s in self.suggestions if s.video == video
            )
        return sorted(nums)

    def save_frame_data_imgstore(
        self,
        output_dir: str = "./",
        format: str = "png",
        all_labeled: bool = False,
        suggested: bool = False,
        progress_callback: Optional[Callable] = None,
    ) -> List[Video]:
        """Write labeled-frame images per video into imgstore directories
        (reference dataset.py:2239; vendored directory store when the
        ``imgstore`` package is absent)."""
        out = []
        for v_idx, video in enumerate(self.videos):
            path = os.path.join(output_dir, f"frame_data_vid{v_idx}")
            vid = video.to_imgstore(
                path=path,
                frame_numbers=self._frame_data_nums(video, all_labeled, suggested),
                format=format,
            )
            if progress_callback is not None:
                if progress_callback(v_idx, len(self.videos)) is False:
                    return []
            out.append(vid)
        return out

    def save_frame_data_hdf5(
        self,
        output_path: str,
        format: str = "png",
        user_labeled: bool = True,
        all_labeled: bool = False,
        suggested: bool = False,
        progress_callback: Optional[Callable] = None,
    ) -> List[Video]:
        """Write labeled-frame images per video into one HDF5 file
        (reference dataset.py:2315; dataset ``video{i}`` per video)."""
        out = []
        for v_idx, video in enumerate(self.videos):
            nums = self._frame_data_nums(
                video, all_labeled, suggested, user_labeled=user_labeled
            )
            vid = video.to_hdf5(
                path=output_path,
                dataset=f"video{v_idx}",
                frame_numbers=nums,
                format=format,
            )
            if progress_callback is not None:
                if progress_callback(v_idx, len(self.videos)) is False:
                    return []
            out.append(vid)
        return out

    # Per-format loader shims (reference dataset.py load_deeplabcut:2185,
    # load_coco, load_alphatracker, load_leap_matlab, load_json, load_nwb).
    @classmethod
    def _load_as(cls, filename: str, fmt: str, **kwargs) -> "Labels":
        from sleap_tpu.io import formats

        return formats.read(filename, as_format=fmt, **kwargs)

    @classmethod
    def load_deeplabcut(cls, filename: str, **kwargs) -> "Labels":
        return cls._load_as(filename, "dlc", **kwargs)

    @classmethod
    def load_coco(cls, filename: str, **kwargs) -> "Labels":
        return cls._load_as(filename, "coco", **kwargs)

    @classmethod
    def load_alphatracker(cls, filename: str, **kwargs) -> "Labels":
        return cls._load_as(filename, "alphatracker", **kwargs)

    @classmethod
    def load_leap_matlab(cls, filename: str, **kwargs) -> "Labels":
        return cls._load_as(filename, "leap", **kwargs)

    @classmethod
    def load_json(cls, filename: str, **kwargs) -> "Labels":
        return cls._load_as(filename, "labels_json", **kwargs)

    @classmethod
    def load_nwb(cls, filename: str, **kwargs) -> "Labels":
        return cls._load_as(filename, "nwb", **kwargs)

    @classmethod
    def load_file(
        cls,
        filename: str,
        video_search: Optional[Union[Callable, List[str], bool]] = None,
        detect_videos: bool = True,
        search_paths: Optional[Union[str, List[str]]] = None,
        **kwargs,
    ) -> "Labels":
        """Load a ``.slp`` file.

        ``video_search`` is the low-level hook (callback, path list, or
        ``False`` to disable fixing). ``detect_videos``/``search_paths``
        mirror the reference's ``sleap.load_file`` surface
        (reference __init__.py load_file): with ``detect_videos=False``
        stored video paths are kept verbatim; ``search_paths`` may be one
        path or a list (files or directories) to search.
        """
        from sleap_tpu.io import slp

        if video_search is None:
            if not detect_videos:
                video_search = False
            elif search_paths is not None:
                video_search = (
                    [search_paths]
                    if isinstance(search_paths, str)
                    else list(search_paths)
                )
        return slp.read_labels(filename, video_search=video_search)

    def __repr__(self) -> str:
        return (
            f"Labels(labeled_frames={len(self.labeled_frames)}, "
            f"videos={len(self.videos)}, skeletons={len(self.skeletons)}, "
            f"tracks={len(self.tracks)})"
        )


def load_file(filename: str, **kwargs) -> Labels:
    """Module-level loader mirroring ``sleap.load_file``."""
    return Labels.load_file(filename, **kwargs)


def _labels_export_csv(self, filename: str) -> None:
    """Export tracked poses as an analysis CSV (reference dataset.py:2071)."""
    from sleap_tpu.info.write_tracking_h5 import export_analysis_file

    export_analysis_file(self, filename, csv=True)


def _labels_export_nwb(self, filename: str, **kwargs) -> None:
    """NWB export (reference dataset.py Labels.export_nwb -> NDXPoseAdaptor).

    The logic lives in :mod:`sleap_tpu.io.formats.ndx_pose`; only the pynwb
    import is gated there.
    """
    from sleap_tpu.io.formats import ndx_pose

    ndx_pose.write_labels(filename, self, **kwargs)


def _labels_export_nix(self, filename: str, video=None, **kwargs) -> None:
    """NIX (nixtrack) export (reference nix.py NixAdaptor.write)."""
    from sleap_tpu.io.formats import nix

    nix.write_labels(filename, self, video=video, **kwargs)


Labels.export_csv = _labels_export_csv
Labels.export_nwb = _labels_export_nwb
Labels.export_nix = _labels_export_nix


def _video_match_key(video):
    """Cross-Labels video identity: a real on-disk filename, else None.

    In-memory NumpyVideo backends lazily rewrite their filename to the
    constant "numpy_video" sentinel, which must NOT match (two distinct
    arrays would silently merge and dedup-drop frames).
    """
    fn = getattr(video, "filename", None)
    if isinstance(fn, str) and fn and fn != "numpy_video":
        return fn
    return None


def _video_match_keys(video):
    """All identities a video can match under: its own filename plus, for
    training packages with embedded images, the embedded source video's
    filename (reference labels_json.py:441-455 matches either)."""
    keys = []
    key = _video_match_key(video)
    if key is not None:
        keys.append(key)
    backend = getattr(video, "backend", None)
    if getattr(backend, "has_embedded_images", False):
        src = getattr(backend, "_source_video_dict", None)
        if src:
            fn = src.get("backend", {}).get("filename")
            if isinstance(fn, str) and fn:
                keys.append(fn)
    return keys


def _unify_skeletons(base_labels, new_labels) -> None:
    """Replace skeletons in ``new_labels`` with matching base skeletons
    (reference labels_json.py:413-438 ``match_to`` semantics).

    Multi-skeleton projects swap only exact structural matches. The common
    1-vs-1 case matches BY NODE NAME: base gains any unseen nodes, and every
    new instance is re-keyed onto the base skeleton (its point rows
    rearranged into base node order, NaN rows for nodes it lacks).
    """
    if not base_labels.skeletons or not new_labels.skeletons:
        return

    def _swap(from_skel, to_skel):
        from_names = list(from_skel.node_names)
        to_names = list(to_skel.node_names)
        for lf in new_labels.labeled_frames:
            for inst in lf.instances:
                if inst.skeleton is not from_skel:
                    continue
                # Copy rows before the swap (Instance.points lazily realigns
                # by node identity, and the two skeletons' Node objects are
                # distinct, so a plain skeleton swap would drop all points);
                # re-key by NAME into the destination order.
                pts = inst.points.copy()
                inst.skeleton = to_skel
                out = empty_points(to_skel.n_nodes, predicted=inst.predicted)
                for j, name in enumerate(to_names):
                    if name in from_names:
                        out[j] = pts[from_names.index(name)]
                inst.points = out

    if len(base_labels.skeletons) == 1 and len(new_labels.skeletons) == 1:
        old = base_labels.skeletons[0]
        new_skel = new_labels.skeletons[0]
        if new_skel is old:
            return
        old_names = set(old.node_names)
        for name in new_skel.node_names:
            if name not in old_names:
                old.add_node(name)
        # (base instances realign to the grown skeleton lazily, by node
        # identity, inside Instance.points)
        _swap(new_skel, old)
        new_labels.skeletons[0] = old
    else:
        for idx, sk in enumerate(new_labels.skeletons):
            if sk in base_labels.skeletons:
                continue
            for old_sk in base_labels.skeletons:
                if sk.matches(old_sk):
                    _swap(sk, old_sk)
                    new_labels.skeletons[idx] = old_sk
                    break


def _labels_merge(self, other: "Labels") -> None:
    """Merge another Labels into this one (frame-level union).

    Frames at the same (video, frame index) combine their instance lists;
    other frames are appended. Matching is by video filename. (The
    reference's interactive three-way conflict resolution lives in its GUI;
    this is the programmatic merge, reference dataset.py:1767.)
    """
    _match_key = _video_match_key

    video_map = {}
    for v_other in other.videos:
        key = _match_key(v_other)
        if key is None:
            continue
        for v_self in self.videos:
            if _match_key(v_self) == key:
                video_map[id(v_other)] = v_self
                break
    for lf in other.labeled_frames:
        video = video_map.get(id(lf.video), lf.video)
        existing = self.find_first(video, lf.frame_idx)
        if existing is None:
            new_lf = LabeledFrame(video=video, frame_idx=lf.frame_idx)
            for inst in lf.instances:
                new_lf.insert_instance(inst)
            self.append(new_lf)
        else:
            existing_pts = [i.numpy() for i in existing.instances]
            for inst in lf.instances:
                dup = any(
                    e.shape == inst.numpy().shape
                    and np.allclose(e, inst.numpy(), equal_nan=True)
                    for e in existing_pts
                )
                if not dup:
                    existing.insert_instance(inst)
    self.update_cache()


Labels.merge = _labels_merge
