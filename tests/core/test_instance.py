"""Instance / PredictedInstance / LabeledFrame / Track behaviors.

Mirrors the reference's ``tests/test_instance.py`` coverage: point coercion,
node indexing, numpy round-trips, centroid/bbox geometry, prediction arrays,
and frame-level instance views (reference sleap/instance.py:344,995,1429).
"""

import numpy as np
import pytest

from sleap_tpu.core.instance import (
    Instance,
    LabeledFrame,
    PredictedInstance,
    Track,
    empty_points,
)
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video


@pytest.fixture
def skeleton():
    sk = Skeleton("test")
    sk.add_nodes(["head", "thorax", "abdomen"])
    sk.add_edge("head", "thorax")
    sk.add_edge("thorax", "abdomen")
    return sk


def test_empty_instance_all_invisible(skeleton):
    inst = Instance(skeleton=skeleton)
    assert len(inst) == 3
    assert inst.n_visible_points == 0
    assert np.isnan(inst.numpy()).all()


def test_points_from_dict(skeleton):
    inst = Instance(skeleton=skeleton, points={"head": (1.0, 2.0), "abdomen": (5.0, 6.0)})
    assert inst.n_visible_points == 2
    assert inst["head"]["x"] == 1.0 and inst["head"]["y"] == 2.0
    # thorax unset -> NaN in numpy output
    assert np.isnan(inst.numpy()[1]).all()
    np.testing.assert_allclose(inst.numpy()[2], [5.0, 6.0])


def test_points_from_dict_unknown_node_raises(skeleton):
    with pytest.raises(KeyError):
        Instance(skeleton=skeleton, points={"wing": (0.0, 0.0)})


def test_points_from_array_nan_marks_invisible(skeleton):
    arr = np.array([[1.0, 2.0], [np.nan, np.nan], [3.0, 4.0]])
    inst = Instance(skeleton=skeleton, points=arr)
    assert inst.n_visible_points == 2
    assert not inst.points["visible"][1]


def test_points_wrong_length_raises(skeleton):
    with pytest.raises(ValueError):
        Instance(skeleton=skeleton, points=empty_points(5))


def test_requires_skeleton():
    with pytest.raises(TypeError):
        Instance(skeleton=None)


def test_node_get_set_by_name_node_and_index(skeleton):
    inst = Instance(skeleton=skeleton)
    inst["head"] = (7.0, 8.0)
    node_obj = skeleton.nodes[1]
    inst[node_obj] = (9.0, 10.0)
    assert inst[0]["x"] == 7.0
    assert inst["thorax"]["y"] == 10.0
    assert "head" in inst
    assert "wing" not in inst


def test_numpy_invisible_as_nan_flag(skeleton):
    inst = Instance(skeleton=skeleton, points={"head": (1.0, 2.0)})
    inst.points["visible"][0] = False
    with_nan = inst.numpy()
    assert np.isnan(with_nan[0]).all()
    raw = inst.numpy(invisible_as_nan=False)
    np.testing.assert_allclose(raw[0], [1.0, 2.0])


def test_centroid_bbox_midpoint(skeleton):
    inst = Instance(
        skeleton=skeleton, points={"head": (0.0, 0.0), "abdomen": (10.0, 20.0)}
    )
    np.testing.assert_allclose(inst.centroid, [5.0, 10.0])
    # bounding_box is (y1, x1, y2, x2) like the reference instance.py:878
    np.testing.assert_allclose(inst.bounding_box, [0.0, 0.0, 20.0, 10.0])
    np.testing.assert_allclose(inst.midpoint, [5.0, 10.0])


def test_transform_points_affine(skeleton):
    inst = Instance(skeleton=skeleton, points={"head": (1.0, 0.0), "thorax": (0.0, 1.0)})
    # 90-degree rotation + translation.
    m = np.array([[0.0, -1.0, 2.0], [1.0, 0.0, 3.0], [0, 0, 1]])
    inst.transform_points(m)
    np.testing.assert_allclose(inst.numpy()[0], [2.0, 4.0], atol=1e-12)
    np.testing.assert_allclose(inst.numpy()[1], [1.0, 3.0], atol=1e-12)


def test_from_numpy_roundtrip(skeleton):
    arr = np.array([[1.0, 2.0], [3.0, 4.0], [np.nan, np.nan]])
    inst = Instance.from_numpy(arr, skeleton=skeleton)
    np.testing.assert_array_equal(
        np.isnan(inst.numpy()), np.isnan(arr)
    )
    np.testing.assert_allclose(inst.numpy()[:2], arr[:2])


def test_instance_matches(skeleton):
    a = Instance(skeleton=skeleton, points={"head": (1, 2)})
    b = Instance(skeleton=skeleton, points={"head": (1, 2)})
    c = Instance(skeleton=skeleton, points={"head": (1, 3)})
    assert a.matches(b)
    assert not a.matches(c)


def test_predicted_from_arrays_and_scores(skeleton):
    pts = np.array([[1.0, 2.0], [np.nan, np.nan], [5.0, 6.0]])
    confs = np.array([0.9, 0.5, 0.7])
    inst = PredictedInstance.from_arrays(pts, confs, 0.8, skeleton)
    assert inst.predicted
    assert inst.score == pytest.approx(0.8)
    s = inst.scores
    assert s[0] == pytest.approx(0.9)
    assert np.isnan(s[1])  # invisible point -> NaN score
    pas = inst.points_and_scores_array
    assert pas.shape == (3, 3)
    np.testing.assert_allclose(pas[2], [5.0, 6.0, 0.7])


def test_predicted_from_instance(skeleton):
    user = Instance(skeleton=skeleton, points={"head": (1.0, 2.0)}, track=Track(name="t"))
    pred = PredictedInstance.from_instance(user, score=0.5)
    assert isinstance(pred, PredictedInstance)
    assert pred.track is user.track
    np.testing.assert_allclose(pred.numpy()[0], [1.0, 2.0])


def test_track_matches():
    a = Track(spawned_on=0, name="animal0")
    b = Track(spawned_on=0, name="animal0")
    c = Track(spawned_on=3, name="animal0")
    assert a.matches(b)
    assert not a.matches(c)


def test_labeled_frame_views(skeleton):
    video = Video.from_numpy(np.zeros((4, 16, 16, 1), np.uint8))
    t = Track(name="t0")
    user = Instance(skeleton=skeleton, points={"head": (1, 1)})
    tracked = Instance(skeleton=skeleton, points={"head": (2, 2)}, track=t)
    pred = PredictedInstance.from_arrays(
        np.ones((3, 2)), np.ones(3), 0.9, skeleton, track=t
    )
    lf = LabeledFrame(video=video, frame_idx=0, instances=[user, tracked, pred])

    assert len(lf) == 3
    assert lf[0] is user
    assert list(iter(lf)) == [user, tracked, pred]
    assert lf.user_instances == [user, tracked]
    assert lf.predicted_instances == [pred]
    assert lf.has_user_instances and lf.has_predicted_instances
    assert lf.has_tracked_instances
    assert tracked in lf.tracked_instances and pred in lf.tracked_instances

    # Instance backrefs are maintained by frame assignment.
    assert user.frame is lf
    assert user.video is video and user.frame_idx == 0


def test_labeled_frame_insert_remove(skeleton):
    lf = LabeledFrame(video=None, frame_idx=0)
    a = Instance(skeleton=skeleton)
    b = Instance(skeleton=skeleton)
    lf.insert_instance(a)
    lf.insert_instance(b, index=0)
    assert lf.instances == [b, a]
    lf.remove_instance(a)
    assert lf.instances == [b]
    assert a.frame is None


def test_labeled_frame_remove_untracked(skeleton):
    t = Track(name="x")
    a = Instance(skeleton=skeleton, track=t)
    b = Instance(skeleton=skeleton)
    lf = LabeledFrame(video=None, frame_idx=0, instances=[a, b])
    lf.remove_untracked()
    assert lf.instances == [a]


def test_labeled_frame_numpy(skeleton):
    a = Instance(skeleton=skeleton, points={"head": (1.0, 2.0)})
    b = Instance(skeleton=skeleton, points={"thorax": (3.0, 4.0)})
    lf = LabeledFrame(video=None, frame_idx=0, instances=[a, b])
    arr = lf.numpy()
    assert arr.shape == (2, 3, 2)
    np.testing.assert_allclose(arr[0, 0], [1.0, 2.0])
    np.testing.assert_allclose(arr[1, 1], [3.0, 4.0])


def test_training_instances_prefers_user_over_linked_prediction(skeleton):
    pred = PredictedInstance.from_arrays(np.ones((3, 2)), np.ones(3), 0.9, skeleton)
    user = Instance(skeleton=skeleton, points={"head": (5, 5)}, from_predicted=pred)
    lf = LabeledFrame(video=None, frame_idx=0, instances=[user, pred])
    # Training instances: user instances (predictions only when no user copy).
    assert user in lf.training_instances
    assert pred not in lf.training_instances


def test_from_pointsarray_aliases_and_fill_missing():
    """Reference-parity conveniences: from_pointsarray, fill_missing,
    LabeledFrame instance counts and instances_to_show."""
    skel = Skeleton.from_names_and_edge_inds(["a", "b", "c"], [(0, 1), (1, 2)])
    pts = np.array([[1.0, 2.0], [np.nan, np.nan], [5.0, 6.0]])
    inst = Instance.from_pointsarray(pts, skeleton=skel)
    assert inst.n_visible_points == 2
    inst.fill_missing(max_x=10, max_y=10)
    # Generated placeholder points get coordinates but stay INVISIBLE
    # (reference instance.py:819): numpy()/visible counts treat them missing.
    assert inst.n_visible_points == 2
    assert np.isnan(inst.numpy()[1]).all()
    assert np.isfinite(inst.points["x"]).all()
    assert inst.points["x"].max() <= 10 and inst.points["y"].max() <= 10

    pred = PredictedInstance.from_pointsarray(
        pts, np.array([0.9, 0.0, 0.8]), 0.7, skel
    )
    assert pred.score == 0.7

    user = Instance.from_numpy(pts, skeleton=skel)
    user.from_predicted = pred
    lf = LabeledFrame(video=None, frame_idx=0, instances=[user, pred])
    assert lf.n_user_instances == 1
    assert lf.n_predicted_instances == 1
    assert lf.n_tracked_instances == 0
    # The prediction is linked to a user correction -> not shown.
    assert lf.instances_to_show == [user]
