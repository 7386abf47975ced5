"""Instance data model: points, tracks, instances, labeled frames.

Rebuild of the reference object model (``/root/reference/sleap/instance.py``:
``Point:37``, ``PredictedPoint:98``, ``Track:310``, ``Instance:344``,
``PredictedInstance:995``, ``LabeledFrame:1429``). Fresh numpy-first design:
points live in structured arrays whose dtypes match the ``.slp`` on-disk
tables exactly, so serialization is a concatenation, not a conversion.
NaN coordinates mean "missing point" (reference convention, instance.py:79).
"""

from __future__ import annotations

import math
import warnings
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import attr
import numpy as np

from sleap_tpu.core.skeleton import Node, Skeleton

# On-disk-compatible structured dtypes (see /root/reference/sleap/io/format/
# hdf5.py:146-149 table layout).
POINT_DTYPE = np.dtype(
    [("x", "<f8"), ("y", "<f8"), ("visible", "?"), ("complete", "?")]
)
PRED_POINT_DTYPE = np.dtype(
    [("x", "<f8"), ("y", "<f8"), ("visible", "?"), ("complete", "?"), ("score", "<f8")]
)


def make_point(
    x: float = math.nan,
    y: float = math.nan,
    visible: bool = True,
    complete: bool = False,
) -> np.void:
    """A single point record (structured scalar)."""
    return np.array([(x, y, visible, complete)], dtype=POINT_DTYPE)[0]


def make_pred_point(
    x: float = math.nan,
    y: float = math.nan,
    visible: bool = True,
    complete: bool = False,
    score: float = 0.0,
) -> np.void:
    return np.array([(x, y, visible, complete, score)], dtype=PRED_POINT_DTYPE)[0]


# Reference-name aliases (reference instance.py:37,98 classes Point /
# PredictedPoint): our points are structured-array records, and these
# factories accept the same (x, y, visible, complete[, score]) signature.
Point = make_point
PredictedPoint = make_pred_point


def empty_points(n: int, predicted: bool = False) -> np.ndarray:
    """Structured point array of length ``n`` with NaN/invisible entries."""
    dtype = PRED_POINT_DTYPE if predicted else POINT_DTYPE
    pts = np.zeros(n, dtype=dtype)
    pts["x"] = np.nan
    pts["y"] = np.nan
    pts["visible"] = False
    return pts


@attr.s(auto_attribs=True, eq=False, slots=True)
class Track:
    """An identity that persists across frames (reference instance.py:310)."""

    spawned_on: int = 0
    name: str = ""

    def matches(self, other: "Track") -> bool:
        return self.name == other.name and self.spawned_on == other.spawned_on

    def __repr__(self) -> str:
        return f"Track(spawned_on={self.spawned_on}, name={self.name!r})"


class Instance:
    """One animal in one frame: a skeleton plus a structured point array.

    Reference analog: ``/root/reference/sleap/instance.py:344``.
    """

    predicted = False

    def __init__(
        self,
        skeleton: Skeleton,
        points: Optional[Union[np.ndarray, Dict[str, Any], Sequence]] = None,
        track: Optional[Track] = None,
        from_predicted: Optional["PredictedInstance"] = None,
        frame: Optional["LabeledFrame"] = None,
    ):
        if skeleton is None:
            raise TypeError("Instance requires a skeleton.")
        self.skeleton = skeleton
        self.track = track
        self.from_predicted = from_predicted
        self.frame = frame
        self._nodes_snapshot: List[Node] = []
        self.points = points

    # ------------------------------------------------------------------ #
    # Point storage: index-aligned to the skeleton, lazily realigned.
    #
    # The reference keys points by Node OBJECT (per-instance dicts,
    # instance.py:344), so mutating the skeleton (add/delete/relabel node)
    # never desyncs instances. Our structured array is index-aligned for
    # speed, so we snapshot the node list at assignment and realign by node
    # identity whenever the skeleton's node list has changed: kept nodes
    # keep their rows, new nodes get missing points, deleted rows drop.
    # Relabeling mutates Node.name in place, so renamed nodes keep points.
    # ------------------------------------------------------------------ #
    @property
    def points(self) -> np.ndarray:
        nodes = self.skeleton.nodes
        snap = self._nodes_snapshot
        if len(nodes) != len(snap) or any(
            a is not b for a, b in zip(nodes, snap)
        ):
            old = self._points
            index = {id(n): i for i, n in enumerate(snap)}
            out = empty_points(len(nodes), predicted=self.predicted)
            for i, n in enumerate(nodes):
                j = index.get(id(n))
                if j is not None and j < len(old):
                    out[i] = old[j]
            self._points = out
            self._nodes_snapshot = list(nodes)
        return self._points

    @points.setter
    def points(self, value) -> None:
        self._points = self._coerce_points(value)
        self._nodes_snapshot = list(self.skeleton.nodes)

    def _point_dtype(self) -> np.dtype:
        return POINT_DTYPE

    def _coerce_points(self, points) -> np.ndarray:
        n = self.skeleton.n_nodes
        dtype = self._point_dtype()
        if points is None:
            return empty_points(n, predicted=self.predicted)
        if isinstance(points, np.ndarray) and points.dtype == dtype:
            if len(points) > n:
                raise ValueError(
                    f"Point array length {len(points)} > n_nodes {n}."
                )
            if len(points) < n:
                # Fewer rows than nodes: the skeleton gained nodes after
                # these points were stored (reference point dicts simply
                # lack the new keys); missing trailing nodes are missing
                # points.
                pad = empty_points(n - len(points), predicted=self.predicted)
                return np.concatenate([points, pad])
            return points.copy()
        if isinstance(points, dict):
            # {node name -> (x, y) | point record}
            pts = empty_points(n, predicted=self.predicted)
            names = self.skeleton.node_names
            for key, val in points.items():
                name = key.name if isinstance(key, Node) else key
                if name not in names:
                    raise KeyError(f"{name} is not a node in the skeleton.")
                i = names.index(name)
                if isinstance(val, np.void):
                    if val.dtype == dtype:
                        pts[i] = val
                    else:  # plain Point into predicted points (or reverse)
                        for field in val.dtype.names:
                            if field in dtype.names:
                                pts[i][field] = val[field]
                else:
                    x, y = val[0], val[1]
                    pts[i] = (
                        (x, y, True, False)
                        if not self.predicted
                        else (x, y, True, False, val[2] if len(val) > 2 else 0.0)
                    )
            return pts
        # (n_nodes, 2) coordinate array
        arr = np.asarray(points, dtype="f8")
        if arr.ndim == 2 and arr.shape[0] == n and arr.shape[1] >= 2:
            pts = empty_points(n, predicted=self.predicted)
            pts["x"] = arr[:, 0]
            pts["y"] = arr[:, 1]
            pts["visible"] = ~(np.isnan(arr[:, 0]) | np.isnan(arr[:, 1]))
            return pts
        raise TypeError(f"Cannot construct points from {type(points)}.")

    # ------------------------------------------------------------------ #
    # Point access
    # ------------------------------------------------------------------ #
    def __getitem__(self, node: Union[str, Node, int]) -> np.void:
        if isinstance(node, (list, tuple)) and not isinstance(node, str):
            return np.array([self[n] for n in node], dtype=self.points.dtype)
        return self.points[self._node_index(node)]

    def __setitem__(self, node: Union[str, Node, int], value) -> None:
        i = self._node_index(node)
        if isinstance(value, np.void):
            self.points[i] = value
        else:
            self.points[i]["x"] = value[0]
            self.points[i]["y"] = value[1]
            self.points[i]["visible"] = not (
                np.isnan(value[0]) or np.isnan(value[1])
            )

    def _node_index(self, node: Union[str, Node, int]) -> int:
        if isinstance(node, int):
            return node
        if isinstance(node, Node):
            return self.skeleton.node_to_index(node)
        return self.skeleton.node_names.index(node)

    def __contains__(self, node: Union[str, Node]) -> bool:
        try:
            i = self._node_index(node)
        except (ValueError, KeyError):
            return False
        return bool(self.points[i]["visible"]) or not np.isnan(self.points[i]["x"])

    def __len__(self) -> int:
        return len(self.points)

    @property
    def nodes(self) -> List[Node]:
        """Nodes that have a non-missing point."""
        mask = ~np.isnan(self.points["x"])
        return [n for n, m in zip(self.skeleton.nodes, mask) if m]

    @property
    def n_visible_points(self) -> int:
        return int(np.count_nonzero(self.points["visible"]))

    # ------------------------------------------------------------------ #
    # Array views
    # ------------------------------------------------------------------ #
    def numpy(self, invisible_as_nan: bool = True) -> np.ndarray:
        """(n_nodes, 2) float array of xy; missing/invisible → NaN."""
        xy = np.stack([self.points["x"], self.points["y"]], axis=-1).astype("f8")
        if invisible_as_nan:
            xy[~self.points["visible"]] = np.nan
        return xy

    def get_points_array(
        self, copy: bool = True, invisible_as_nan: bool = False, full: bool = False
    ) -> np.ndarray:
        """Points in array form (reference instance.py:745).

        With ``copy=False`` returns a VIEW of the underlying structured
        array (``invisible_as_nan`` is then ignored — we never NaN the
        original data); ``full=True`` returns every column of the point
        dtype as a plain float ndarray, else just (x, y).
        """
        if not copy:
            if full:
                return self.points
            return self.points[["x", "y"]]
        names = list(self.points.dtype.names) if full else ["x", "y"]
        arr = np.stack(
            [self.points[n].astype("f8") for n in names], axis=-1
        )
        if invisible_as_nan:
            arr[~self.points["visible"]] = np.nan  # whole ROW, like reference
        return arr

    @property
    def points_array(self) -> np.ndarray:
        """(n_nodes, 2) xy with invisible points as NaN — a PROPERTY, like
        the reference's (instance.py:822)."""
        return self.numpy()

    def transform_points(self, transformation_matrix: np.ndarray) -> None:
        """Apply a 2x2 linear, 2x3 affine (cv2.getRotationMatrix2D form), or
        3x3 homogeneous transform to the xy coordinates in place (reference
        instance.py:845)."""
        xy = self.numpy(invisible_as_nan=False)
        if transformation_matrix.shape == (2, 3):
            xy = xy @ transformation_matrix[:, :2].T + transformation_matrix[:, 2]
        elif transformation_matrix.shape == (3, 3):
            ones = np.ones((len(xy), 1))
            xy = np.concatenate([xy, ones], axis=1) @ transformation_matrix.T
            xy = xy[:, :2]
        else:
            xy = xy @ transformation_matrix.T
        self.points["x"] = xy[:, 0]
        self.points["y"] = xy[:, 1]

    def _merge_nodes_data(self, base_node: str, merge_node: str) -> None:
        """Copy ``merge_node``'s point (all fields, incl. score for predicted
        points) into ``base_node`` when the base point is unset or invisible
        and the merge point has data (reference instance.py:919-948). Used by
        :meth:`Labels.merge_nodes` before the merged node is deleted."""
        names = self.skeleton.node_names
        bi, mi = names.index(base_node), names.index(merge_node)
        pts = self.points
        merge_has = bool(pts["visible"][mi]) and not np.isnan(pts["x"][mi])
        base_missing = (not pts["visible"][bi]) or np.isnan(pts["x"][bi])
        if merge_has and base_missing:
            for field in pts.dtype.names:
                pts[field][bi] = pts[field][mi]

    @property
    def centroid(self) -> np.ndarray:
        """Mean of visible points (reference instance.py:867)."""
        pts = self.numpy()
        return np.nanmean(pts, axis=0)

    @property
    def bounding_box(self) -> np.ndarray:
        """[y1, x1, y2, x2] over visible points (reference instance.py:878).

        All-NaN (no visible points) yields a NaN box without the numpy
        All-NaN-slice RuntimeWarning.
        """
        pts = self.numpy()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            return np.array(
                [
                    np.nanmin(pts[:, 1]),
                    np.nanmin(pts[:, 0]),
                    np.nanmax(pts[:, 1]),
                    np.nanmax(pts[:, 0]),
                ]
            )

    @property
    def midpoint(self) -> np.ndarray:
        """Middle of the bounding box."""
        y1, x1, y2, x2 = self.bounding_box
        return np.array([(x1 + x2) / 2.0, (y1 + y2) / 2.0])

    @property
    def video(self):
        return self.frame.video if self.frame is not None else None

    @property
    def frame_idx(self) -> Optional[int]:
        return self.frame.frame_idx if self.frame is not None else None

    # ------------------------------------------------------------------ #
    @classmethod
    def from_numpy(
        cls,
        points: np.ndarray,
        skeleton: Skeleton,
        track: Optional[Track] = None,
    ) -> "Instance":
        """Build from an (n_nodes, 2) array; NaN rows are missing."""
        return cls(skeleton=skeleton, points=np.asarray(points), track=track)

    @classmethod
    def from_pointsarray(
        cls,
        points: np.ndarray,
        skeleton: Skeleton,
        track: Optional[Track] = None,
    ) -> "Instance":
        """Alias of :meth:`from_numpy` (reference instance.py:924)."""
        return cls.from_numpy(points, skeleton=skeleton, track=track)

    def fill_missing(
        self, max_x: Optional[float] = None, max_y: Optional[float] = None
    ) -> None:
        """Add random in-bbox points for missing nodes (reference
        instance.py:789; GUI convenience for newly added skeleton nodes)."""
        y1, x1, y2, x2 = self.bounding_box
        y1, x1 = np.nanmax([y1, 0.0]), np.nanmax([x1, 0.0])
        if max_x is not None:
            x2 = np.nanmin([x2, max_x])
        if max_y is not None:
            y2 = np.nanmin([y2, max_y])
        w, h = x2 - x1, y2 - y1
        if np.isnan(w) or np.isnan(h):
            x1 = y1 = 0.0
            w = max_x if max_x is not None else 1.0
            h = max_y if max_y is not None else 1.0
        missing = ~self.points["visible"]
        n = int(np.count_nonzero(missing))
        if n == 0:
            return
        xy = np.random.rand(n, 2) * np.array([w, h]) + np.array([x1, y1])
        xy = np.maximum(xy, 0.0)
        if max_x is not None:
            xy[:, 0] = np.minimum(xy[:, 0], max_x)
        if max_y is not None:
            xy[:, 1] = np.minimum(xy[:, 1], max_y)
        self.points["x"][missing] = xy[:, 0]
        self.points["y"][missing] = xy[:, 1]
        # Reference keeps the generated points INVISIBLE (instance.py:819):
        # they are GUI placeholders, not labeled data — numpy()/centroid/
        # n_visible_points must still treat these nodes as missing.
        self.points["visible"][missing] = False

    def matches(self, other: "Instance") -> bool:
        if type(self) is not type(other):
            return False
        if not self.skeleton.matches(other.skeleton):
            return False
        a, b = self.numpy(), other.numpy()
        if a.shape != b.shape:
            return False
        return bool(np.all(np.isclose(a, b, equal_nan=True)))

    def __repr__(self) -> str:
        return (
            f"Instance(video={self.video}, frame_idx={self.frame_idx}, "
            f"points={self.n_visible_points}/{len(self)}, track={self.track})"
        )


class PredictedInstance(Instance):
    """Model-predicted instance with scores (reference instance.py:995)."""

    predicted = True

    def __init__(
        self,
        skeleton: Skeleton,
        points: Optional[Union[np.ndarray, Dict[str, Any], Sequence]] = None,
        track: Optional[Track] = None,
        score: float = 0.0,
        tracking_score: float = 0.0,
        frame: Optional["LabeledFrame"] = None,
    ):
        super().__init__(skeleton=skeleton, points=points, track=track, frame=frame)
        self.score = float(score)
        self.tracking_score = float(tracking_score)

    def _point_dtype(self) -> np.dtype:
        return PRED_POINT_DTYPE

    @property
    def scores(self) -> np.ndarray:
        """(n_nodes,) per-point confidences; NaN where missing."""
        s = self.points["score"].astype("f8").copy()
        s[~self.points["visible"]] = np.nan
        return s

    @property
    def points_and_scores_array(self) -> np.ndarray:
        """(n_nodes, 3) array of x, y, score — a PROPERTY, like the
        reference's (instance.py:1035)."""
        xy = self.numpy()
        return np.concatenate([xy, self.scores[:, None]], axis=1)

    @classmethod
    def from_arrays(
        cls,
        points: np.ndarray,
        point_confidences: np.ndarray,
        instance_score: float,
        skeleton: Skeleton,
        track: Optional[Track] = None,
        tracking_score: float = 0.0,
    ) -> "PredictedInstance":
        """Build from (n_nodes, 2) xy + (n_nodes,) confidences.

        Reference analog: instance.py:1080 ``PredictedInstance.from_arrays``.
        """
        points = np.asarray(points, dtype="f8")
        confs = np.asarray(point_confidences, dtype="f8").reshape(-1)
        n = len(points)
        pts = empty_points(n, predicted=True)
        pts["x"] = points[:, 0]
        pts["y"] = points[:, 1]
        pts["visible"] = ~(np.isnan(points[:, 0]) | np.isnan(points[:, 1]))
        pts["score"] = np.where(np.isnan(confs), 0.0, confs)
        return cls(
            skeleton=skeleton,
            points=pts,
            track=track,
            score=float(instance_score),
            tracking_score=tracking_score,
        )

    from_numpy = from_arrays  # alias matching reference instance.py:1164
    from_pointsarray = from_arrays  # alias matching reference instance.py:1127

    @classmethod
    def from_instance(cls, instance: Instance, score: float) -> "PredictedInstance":
        xy = instance.numpy()
        conf = np.ones(len(xy))
        return cls.from_arrays(xy, conf, score, instance.skeleton, track=instance.track)

    def __repr__(self) -> str:
        return (
            f"PredictedInstance(video={self.video}, frame_idx={self.frame_idx}, "
            f"points={self.n_visible_points}/{len(self)}, score={self.score:.2f}, "
            f"track={self.track})"
        )


class InstancesList(list):
    """A list of instances that keeps each member's ``frame`` backlink in
    sync with an owning :class:`LabeledFrame`.

    Reference analog: ``/root/reference/sleap/instance.py:1307``. Every list
    mutation stamps (or clears) ``instance.frame``; ``copy()`` returns a plain
    list, matching the reference.
    """

    def __init__(self, *args, labeled_frame: Optional["LabeledFrame"] = None):
        super().__init__(*args)
        self._labeled_frame = labeled_frame
        for inst in self:
            inst.frame = labeled_frame

    @property
    def labeled_frame(self) -> Optional["LabeledFrame"]:
        return self._labeled_frame

    @labeled_frame.setter
    def labeled_frame(self, labeled_frame: Optional["LabeledFrame"]) -> None:
        if getattr(self, "_labeled_frame", None) is labeled_frame:
            return
        self._labeled_frame = labeled_frame
        for inst in self:
            inst.frame = labeled_frame

    def append(self, instance: "Instance") -> None:
        if not isinstance(instance, Instance):
            raise ValueError(
                "InstancesList can only contain Instance or PredictedInstance "
                f"objects, but got {type(instance)}."
            )
        instance.frame = self._labeled_frame
        super().append(instance)

    def extend(self, instances: Iterable["Instance"]) -> None:
        for inst in instances:
            self.append(inst)

    def insert(self, index: int, instance: "Instance") -> None:
        super().insert(index, instance)
        instance.frame = self._labeled_frame

    def __setitem__(self, index, instance) -> None:
        super().__setitem__(index, instance)
        instance.frame = self._labeled_frame

    def __delitem__(self, index) -> None:
        instance = self[index]
        super().__delitem__(index)
        instance.frame = None

    def pop(self, index: int = -1) -> "Instance":
        instance = super().pop(index)
        instance.frame = None
        return instance

    def remove(self, instance: "Instance") -> None:
        super().remove(instance)
        instance.frame = None

    def clear(self) -> None:
        for inst in self:
            inst.frame = None
        super().clear()

    def copy(self) -> list:
        return list(self)


class LabeledFrame:
    """All instances labeled/predicted in one video frame.

    Reference analog: ``/root/reference/sleap/instance.py:1429``.
    """

    def __init__(
        self,
        video: Any,
        frame_idx: int,
        instances: Optional[Iterable[Instance]] = None,
    ):
        self.video = video
        self.frame_idx = int(frame_idx)
        self._instances = InstancesList(labeled_frame=self)
        if instances:
            for inst in instances:
                self.insert_instance(inst)

    # ------------------------------------------------------------------ #
    @property
    def instances(self) -> "InstancesList":
        return self._instances

    @instances.setter
    def instances(self, value: Iterable[Instance]) -> None:
        self._instances = InstancesList(labeled_frame=self)
        for inst in value:
            self.insert_instance(inst)

    def insert_instance(self, instance: Instance, index: Optional[int] = None) -> None:
        if index is None:
            self._instances.append(instance)
        else:
            self._instances.insert(index, instance)

    def remove_instance(self, instance: Instance) -> None:
        self._instances.remove(instance)

    def __len__(self) -> int:
        return len(self._instances)

    def __getitem__(self, i: int) -> Instance:
        return self._instances[i]

    def __setitem__(self, i: int, instance: Instance) -> None:
        self._instances[i] = instance

    def __delitem__(self, i: int) -> None:
        del self._instances[i]

    def index(self, instance: Instance) -> int:
        return self._instances.index(instance)

    def insert(self, index: int, instance: Instance) -> None:
        self._instances.insert(index, instance)

    def __iter__(self):
        return iter(self._instances)

    @property
    def user_instances(self) -> List[Instance]:
        return [i for i in self._instances if not i.predicted]

    @property
    def predicted_instances(self) -> List["PredictedInstance"]:
        return [i for i in self._instances if i.predicted]

    @property
    def training_instances(self) -> List[Instance]:
        return [i for i in self.user_instances if i.n_visible_points > 0]

    @property
    def has_user_instances(self) -> bool:
        return len(self.user_instances) > 0

    @property
    def has_predicted_instances(self) -> bool:
        return len(self.predicted_instances) > 0

    @property
    def has_tracked_instances(self) -> bool:
        return any(i.track is not None for i in self._instances)

    @property
    def tracked_instances(self) -> List[Instance]:
        return [i for i in self._instances if i.track is not None]

    @property
    def n_user_instances(self) -> int:
        return len(self.user_instances)

    @property
    def n_predicted_instances(self) -> int:
        return len(self.predicted_instances)

    @property
    def n_tracked_instances(self) -> int:
        return len(self.tracked_instances)

    @property
    def unused_predictions(self) -> List["PredictedInstance"]:
        """Predictions not linked from any user instance in this frame."""
        used = {id(i.from_predicted) for i in self.user_instances if i.from_predicted}
        return [p for p in self.predicted_instances if id(p) not in used]

    @property
    def instances_to_show(self) -> List[Instance]:
        """User instances plus predictions without a user correction — what a
        GUI would draw (reference instance.py:1678)."""
        return self.user_instances + self.unused_predictions

    # ------------------------------------------------------------------ #
    # Conflict-aware merging (reference instance.py:1749-1900)
    # ------------------------------------------------------------------ #
    @classmethod
    def complex_frame_merge(cls, base_frame, new_frame):
        """Merge ``new_frame`` into ``base_frame``; return
        ``(merged_instances, extra_base_frame, extra_new_frame)``.

        A conflict exists only when BOTH frames carry same-kind instances
        (user vs predicted) that have no perfect match in the other; then the
        base keeps only the perfectly-matching (redundant) instances and both
        sides' extras come back as conflict frames for the caller to resolve.
        """
        redundant: List[Instance] = []
        extra_base = list(base_frame.instances)
        extra_new: List[Instance] = []
        for new_inst in new_frame.instances:
            matched = None
            for base_inst in extra_base:
                if new_inst.matches(base_inst):
                    matched = base_inst
                    break
            if matched is not None:
                extra_base.remove(matched)
                redundant.append(matched)
            else:
                extra_new.append(new_inst)

        conflict = False
        if extra_base and extra_new:
            base_pred = sum(1 for i in extra_base if i.predicted)
            new_pred = sum(1 for i in extra_new if i.predicted)
            if base_pred and new_pred:
                conflict = True
            elif (len(extra_base) - base_pred) and (len(extra_new) - new_pred):
                conflict = True

        merged: List[Instance] = []
        if conflict:
            base_frame.instances = redundant
        else:
            merged = list(extra_new)
            for inst in extra_new:
                base_frame.insert_instance(inst)
            extra_base, extra_new = [], []

        mk = lambda frame, insts: (
            cls(video=frame.video, frame_idx=frame.frame_idx, instances=insts)
            if insts
            else None
        )
        return merged, mk(base_frame, extra_base), mk(new_frame, extra_new)

    @classmethod
    def complex_merge_between(cls, base_labels, new_frames):
        """Merge a list of frames into ``base_labels``, collecting conflicts
        (reference instance.py:1749). Returns ``(merged_dict, extra_base,
        extra_new)`` where merged_dict maps video -> frame_idx -> instances.
        """
        merged: Dict[Any, Dict[int, List[Instance]]] = {}
        extra_base: List["LabeledFrame"] = []
        extra_new: List["LabeledFrame"] = []
        for new_frame in new_frames:
            base_lfs = base_labels.find(new_frame.video, new_frame.frame_idx)
            if not base_lfs:
                base_labels.labeled_frames.append(new_frame)
                merged_instances = new_frame.instances
            else:
                merged_instances, eb, en = cls.complex_frame_merge(
                    base_lfs[0], new_frame
                )
                if eb:
                    extra_base.append(eb)
                if en:
                    extra_new.append(en)
            if merged_instances:
                merged.setdefault(new_frame.video, {})[new_frame.frame_idx] = (
                    merged_instances
                )
        return merged, extra_base, extra_new

    @property
    def image(self) -> np.ndarray:
        return self.video.get_frame(self.frame_idx)

    def numpy(self) -> np.ndarray:
        """(n_instances, n_nodes, 2) stacked point coordinates."""
        if not self._instances:
            return np.zeros((0, 0, 2))
        return np.stack([i.numpy() for i in self._instances], axis=0)

    def remove_untracked(self) -> None:
        self._instances = [i for i in self._instances if i.track is not None]

    def remove_empty_instances(self) -> None:
        self._instances = [i for i in self._instances if i.n_visible_points > 0]

    def __repr__(self) -> str:
        return (
            f"LabeledFrame(video={getattr(self.video, 'filename', self.video)}, "
            f"frame_idx={self.frame_idx}, instances={len(self._instances)})"
        )
