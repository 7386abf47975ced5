"""Instance point-array / skeleton-mutation / frame-merge semantics.

Ports the remaining reference ``tests/test_instance.py`` matrix not already
covered by ``test_instance.py`` here: get_points_array copy/full variants
(reference instance.py:745), skeleton rename/add/delete reflection, instance
comparison, predicted points+scores, and the user/predicted frame-merge
contract (reference instance.py:1749, tests/test_instance.py:287-365).
"""

import copy

import numpy as np
import pytest

from sleap_tpu.core.instance import (
    Instance,
    LabeledFrame,
    PredictedInstance,
    make_point,
    make_pred_point,
)
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video


@pytest.fixture
def skeleton():
    sk = Skeleton("fly")
    sk.add_nodes(["head", "thorax", "left-wing", "right-wing"])
    sk.add_edge("head", "thorax")
    return sk


@pytest.fixture
def video():
    return Video.from_numpy(np.zeros((2, 16, 16, 1), dtype=np.uint8))


def test_skeleton_node_name_change():
    s = Skeleton("Test")
    s.add_nodes(["a", "b", "c", "d", "e"])
    s.add_edge("a", "b")

    instance = Instance(skeleton=s)
    instance["a"] = (1, 2)
    instance["b"] = (3, 4)

    s.relabel_nodes({"a": "A"})

    # Old name no longer resolves.
    with pytest.raises((KeyError, ValueError)):
        instance["a"]

    # New name references the same point.
    assert instance["A"]["x"] == 1 and instance["A"]["y"] == 2
    assert instance["b"]["x"] == 3 and instance["b"]["y"] == 4


def test_instance_comparison(skeleton):
    points = {"head": (1, 4), "left-wing": (2, 5), "right-wing": (3, 6)}
    instance1 = Instance(skeleton=skeleton, points=points)
    instance2 = copy.deepcopy(instance1)

    assert instance1.matches(instance1)
    assert instance1 is not instance2
    assert instance1.matches(instance2)

    instance2["head"]["x"] = 42
    assert not instance1.matches(instance2)

    instance2 = copy.deepcopy(instance1)
    instance2.skeleton.add_node("extra_node")
    assert not instance1.matches(instance2)


def test_points_array(skeleton):
    points = {"head": (1, 4), "left-wing": (2, 5), "right-wing": (3, 6)}
    instance1 = Instance(skeleton=skeleton, points=points)

    pts = instance1.get_points_array()
    assert pts.shape == (len(skeleton.nodes), 2)
    assert np.allclose(pts[skeleton.node_to_index("left-wing")], [2, 5])
    assert np.allclose(pts[skeleton.node_to_index("head")], [1, 4])
    assert np.allclose(pts[skeleton.node_to_index("right-wing")], [3, 6])
    assert np.isnan(pts[skeleton.node_to_index("thorax")]).all()

    # Point mutation is reflected.
    instance1["head"]["x"] = 0
    instance1["thorax"] = (1, 2)
    pts = instance1.get_points_array()
    assert np.allclose(pts[skeleton.node_to_index("head")], [0, 4])
    assert np.allclose(pts[skeleton.node_to_index("thorax")], [1, 2])

    # Invisible points are NaN iff invisible_as_nan (points_array property
    # always NaNs them, reference instance.py:822).
    instance1["thorax"] = make_point(1, 2, visible=False)
    pts = instance1.get_points_array()
    assert not np.isnan(pts[skeleton.node_to_index("thorax")]).all()
    pts = instance1.points_array
    assert np.isnan(pts[skeleton.node_to_index("thorax")]).all()


def test_points_array_copying(skeleton):
    points = {"head": (1, 4), "left-wing": (2, 5), "right-wing": (3, 6)}
    instance1 = Instance(skeleton=skeleton, points=points)
    first_node = skeleton.nodes[0]

    # copy=False returns a view: mutating it mutates the instance.
    pts = instance1.get_points_array(copy=False)
    assert pts[0]["x"] == instance1[first_node]["x"]
    pts[0]["x"] = 123
    assert pts[0]["x"] == instance1[first_node]["x"]

    # copy=True detaches.
    pts = instance1.get_points_array(copy=True)
    assert pts[0][0] == instance1[first_node]["x"]
    pts[0][0] = 456
    assert pts[0][0] != instance1[first_node]["x"]

    # full=True carries every column of the point dtype.
    pts = instance1.get_points_array(copy=True, full=True)
    assert pts.shape[1] == 4  # x, y, visible, complete

    pts = instance1.get_points_array(copy=True, full=False)
    assert pts.shape[1] == 2

    # full + invisible_as_nan NaNs the whole row (reference behavior).
    instance1["head"] = make_point(9, 9, visible=False)
    pts = instance1.get_points_array(copy=True, full=True, invisible_as_nan=True)
    head_row = pts[skeleton.node_to_index("head")]
    assert np.isnan(head_row).all()


def test_predicted_points_array_with_score(skeleton):
    pred_inst = PredictedInstance(
        skeleton=skeleton,
        points={
            "head": make_pred_point(1, 2, score=0.3),
            "thorax": make_pred_point(4, 5, score=0.6, visible=False),
        },
        score=1.0,
    )
    pts = pred_inst.points_and_scores_array
    assert pts[0, 0] == 1 and pts[0, 1] == 2 and pts[0, 2] == pytest.approx(0.3)
    # Invisible point rows are NaN.
    assert np.isnan(pts[1, 0])


def test_modifying_skeleton(skeleton):
    points = {"head": (1, 4), "left-wing": (2, 5), "right-wing": (3, 6)}
    instance1 = Instance(skeleton=skeleton, points=points)
    assert len(instance1.points) == 4

    skeleton.add_node("new test node")
    instance1.points  # re-syncs against the skeleton
    instance1["new test node"] = (7, 8)
    assert len(instance1.points) == 5
    assert instance1["new test node"]["x"] == 7

    skeleton.delete_node("head")
    assert len(instance1.points) == 4
    # Surviving points kept their values through the resync.
    assert instance1["left-wing"]["x"] == 2


def test_instance_labeled_frame_ref(skeleton, video):
    instances = [Instance(skeleton=skeleton) for _ in range(3)]
    frame = LabeledFrame(video=video, frame_idx=0, instances=instances)
    assert frame.instances[0].frame is frame
    assert frame[0].frame is frame
    assert frame[0].frame_idx == 0


def test_frame_merge_predicted_and_user(skeleton, video):
    user_inst = Instance(skeleton=skeleton, points={"head": (1, 2)})
    user_frame = LabeledFrame(video=video, frame_idx=0, instances=[user_inst])

    pred_inst = PredictedInstance(
        skeleton=skeleton,
        points={"head": make_pred_point(1, 2, score=1.0)},
        score=1.0,
    )
    pred_frame = LabeledFrame(video=video, frame_idx=0, instances=[pred_inst])

    LabeledFrame.complex_frame_merge(user_frame, pred_frame)

    # A user instance and a perfectly-matching prediction are BOTH retained
    # (different kinds never conflict — reference tests/test_instance.py:309).
    assert user_inst in user_frame.instances
    assert pred_inst in user_frame.instances
    assert user_inst.frame is user_frame
    assert pred_inst.frame is user_frame
    assert len(user_frame.instances) == 2


def test_frame_merge_between_predicted_and_user(skeleton, video):
    user_inst = Instance(skeleton=skeleton, points={"head": (1, 2)})
    user_labels = Labels(
        [LabeledFrame(video=video, frame_idx=0, instances=[user_inst])]
    )
    pred_inst = PredictedInstance(
        skeleton=skeleton,
        points={"head": make_pred_point(1, 2, score=1.0)},
        score=1.0,
    )
    pred_labels = Labels(
        [LabeledFrame(video=video, frame_idx=0, instances=[pred_inst])]
    )

    _, _, new_conflicts = Labels.complex_merge_between(
        user_labels, new_labels=pred_labels, unify=False
    )
    Labels.finish_complex_merge(user_labels, new_conflicts)

    assert user_inst in user_labels[0].instances
    assert pred_inst in user_labels[0].instances
    assert len(user_labels[0].instances) == 2


def test_instance_rotation(skeleton):
    """2x3 affine (cv2.getRotationMatrix2D form) transform parity
    (reference tests/test_instance.py:367)."""
    instance = Instance(skeleton=skeleton)
    instance["head"] = make_point(20, 50)

    # cv2.getRotationMatrix2D((10, 10), 45, 1)
    mat = np.array(
        [[0.70710678, 0.70710678, -4.14213562], [-0.70710678, 0.70710678, 10.0]]
    )
    instance.transform_points(mat)

    assert int(instance["head"]["x"]) == 45
    assert int(instance["head"]["y"]) == 31


def test_merge_nodes_data(min_labels):
    """Per-instance node-merge semantics (reference tests/test_instance.py:385)."""
    labels = min_labels.copy()
    labels.skeleton.add_node("a")

    # base node point set and visible: keep base
    inst = labels[0][0]
    inst["A"] = make_point(0, 1, visible=True)
    inst["a"] = make_point(1, 2, visible=True)
    inst._merge_nodes_data("A", "a")
    assert inst["A"]["x"] == 0 and inst["A"]["y"] == 1

    # base node point unset: take merge
    inst = labels[0][0]
    inst["A"] = make_point(np.nan, np.nan, visible=False)
    inst["a"] = make_point(1, 2, visible=True)
    inst._merge_nodes_data("A", "a")
    assert inst["A"]["x"] == 1 and inst["A"]["y"] == 2

    # base node point set but not visible: take merge
    inst = labels[0][1]
    inst["A"] = make_point(0, 1, visible=False)
    inst["a"] = make_point(1, 2, visible=True)
    inst._merge_nodes_data("A", "a")
    assert inst["A"]["x"] == 1 and inst["A"]["y"] == 2

    # predicted instance: score comes along
    inst = PredictedInstance.from_numpy(
        points=np.array([[np.nan, np.nan], [1, 2], [2, 3]]),
        point_confidences=np.array([0.1, 0.8, 0.9]),
        instance_score=0.7,
        skeleton=labels.skeleton,
    )
    inst._merge_nodes_data("A", "a")
    assert (
        inst["A"]["x"] == 2 and inst["A"]["y"] == 3 and inst["A"]["score"] == 0.9
    )


def test_instance_fill_missing_bounds():
    """fill_missing samples inside the bbox / given bounds
    (reference tests/test_instance.py:421)."""
    skel = Skeleton.from_names_and_edge_inds(["a", "b", "c"], [])

    for _ in range(10):
        inst = Instance.from_numpy(
            np.array([[1, 1], [10, 10], [np.nan, np.nan]]), skeleton=skel
        )
        inst.fill_missing()
        assert 0 <= inst.points["x"][2] <= 10
        assert 0 <= inst.points["y"][2] <= 10

    for _ in range(10):
        inst = Instance.from_numpy(
            np.array([[1, 1], [10, 10], [np.nan, np.nan]]), skeleton=skel
        )
        inst.fill_missing(max_x=7, max_y=5)
        assert 0 <= inst.points["x"][2] <= 7
        assert 0 <= inst.points["y"][2] <= 5


def test_labeledframe_instance_counting_fixture(min_labels):
    """Counting properties against real fixtures
    (reference tests/test_instance.py:453)."""
    preds = Labels.load_file(
        "/root/reference/tests/data/hdf5_format_v1/centered_pair_predictions.slp"
    )
    lf = preds.labeled_frames[0]
    assert lf.n_user_instances == 0
    assert len(lf.user_instances) == 0
    assert not lf.has_user_instances
    assert lf.n_predicted_instances == 2
    assert all(type(inst) == PredictedInstance for inst in lf.predicted_instances)
    assert lf.has_predicted_instances
    assert lf.n_tracked_instances == 2
    assert all(inst.track is not None for inst in lf.tracked_instances)
    assert lf.has_tracked_instances

    lf = min_labels.labeled_frames[0]
    assert lf.n_user_instances == 2
    assert all(type(inst) == Instance for inst in lf.user_instances)
    assert lf.has_user_instances
    assert lf.n_predicted_instances == 0
    assert not lf.has_predicted_instances
    assert lf.n_tracked_instances == 0
    assert not lf.has_tracked_instances


def test_instance_structuring_from_predicted():
    """Labels.copy survives user instances linked to predictions
    (reference tests/test_instance.py:518)."""
    labels = Labels.load_file(
        "/root/reference/tests/data/hdf5_format_v1/centered_pair_predictions.slp"
    ).copy()
    pred_inst = labels[0][0]
    assert type(pred_inst) == PredictedInstance

    inst = Instance.from_numpy(pred_inst.numpy(), pred_inst.skeleton)
    labels[0].instances.append(inst)
    labels_copy = labels.copy()

    inst.from_predicted = pred_inst
    assert inst.from_predicted == pred_inst

    labels_copy = labels.copy()
    new_inst = [i for i in labels_copy[0].instances if type(i) == Instance][0]
    assert type(new_inst.from_predicted) == PredictedInstance
