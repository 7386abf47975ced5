"""Named-API parity: PointsRescaler, describe_tensors, InstancesList.

Reference analogs: ``sleap/nn/data/resizing.py:473``, ``sleap/nn/data/
utils.py:87``, ``sleap/instance.py:1307``.
"""

import numpy as np
import pytest

from sleap_tpu.core.instance import Instance, InstancesList, LabeledFrame
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.data.resizing import PointsRescaler
from sleap_tpu.data.utils import describe_tensors, ensure_list, expand_to_rank


def test_points_rescaler_invert_and_apply():
    pts = np.array([[[2.0, 4.0], [6.0, 8.0]]], np.float32)
    ex = {"predicted_instances": pts, "scale": np.float32(2.0)}
    (out,) = list(PointsRescaler().transform_dataset([ex]))
    np.testing.assert_allclose(out["predicted_instances"], pts / 2.0)
    (out,) = list(PointsRescaler(invert=False).transform_dataset([ex]))
    np.testing.assert_allclose(out["predicted_instances"], pts * 2.0)
    # per-axis scale broadcasts against the last dim like the reference
    ex2 = {"predicted_instances": pts, "scale": np.array([2.0, 4.0], np.float32)}
    (out,) = list(PointsRescaler().transform_dataset([ex2]))
    np.testing.assert_allclose(out["predicted_instances"], pts / [2.0, 4.0])
    assert PointsRescaler().input_keys == ["predicted_instances", "scale"]
    assert PointsRescaler().output_keys == PointsRescaler().input_keys


def test_expand_to_rank_and_ensure_list():
    x = np.zeros((3, 2))
    assert expand_to_rank(x, 4).shape == (1, 1, 3, 2)
    assert expand_to_rank(x, 4, prepend=False).shape == (3, 2, 1, 1)
    assert expand_to_rank(x, 1).shape == (3, 2)  # never squeezes
    assert ensure_list(1) == [1]
    assert ensure_list([1, 2]) == [1, 2]


def test_describe_tensors(capsys):
    ex = {"image": np.zeros((2, 3), np.uint8), "scale": 1.0}
    desc = describe_tensors(ex, return_description=True)
    assert "image" in desc and "shape=(2, 3)" in desc and "uint8" in desc
    assert describe_tensors(ex) is None
    assert "image" in capsys.readouterr().out


@pytest.fixture
def skel():
    return Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)], name="S")


def test_instances_list_frame_sync(skel):
    insts = [Instance(skeleton=skel, points=np.zeros((2, 2))) for _ in range(3)]
    lf = LabeledFrame(video=None, frame_idx=0, instances=insts[:2])
    assert isinstance(lf.instances, InstancesList)
    assert all(i.frame is lf for i in insts[:2])

    # append stamps the frame; pop/remove/clear clear it
    lf.instances.append(insts[2])
    assert insts[2].frame is lf
    popped = lf.instances.pop()
    assert popped is insts[2] and popped.frame is None
    lf.instances.remove(insts[0])
    assert insts[0].frame is None
    lf.instances.clear()
    assert insts[1].frame is None and len(lf.instances) == 0

    # only Instance subclasses are accepted
    with pytest.raises(ValueError):
        lf.instances.append("not an instance")

    # retargeting the list re-stamps every member
    lst = InstancesList(insts)
    assert all(i.frame is None for i in insts)
    lf2 = LabeledFrame(video=None, frame_idx=1)
    lst.labeled_frame = lf2
    assert all(i.frame is lf2 for i in insts)
    assert type(lst.copy()) is list

    # setitem / delitem / insert / extend maintain backlinks
    lst[0] = Instance(skeleton=skel, points=np.zeros((2, 2)))
    assert lst[0].frame is lf2
    del lst[1]
    assert insts[1].frame is None
    lst2 = InstancesList(labeled_frame=lf2)
    lst2.extend([insts[1]])
    assert insts[1].frame is lf2
