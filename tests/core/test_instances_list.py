"""InstancesList / LabeledFrame backlink-sync semantics matrix.

Ports the reference's ``tests/test_instance.py::test_instances_list`` and
``test_instances_list_with_labeled_frame`` (reference sleap/instance.py:1307,
1429): every list mutation must stamp or clear each member's ``frame``
backlink, construction from plain lists vs InstancesList differs in frame
ownership, and LabeledFrame delegates indexing/mutation to its list.
"""

import numpy as np
import pytest

from sleap_tpu.core.instance import (
    Instance,
    InstancesList,
    LabeledFrame,
    PredictedInstance,
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


@pytest.fixture
def video():
    return Video.from_numpy(np.zeros((4, 16, 16, 1), dtype=np.uint8))


def _pred(skeleton, offset=0.0):
    pts = np.arange(6, dtype=np.float64).reshape(3, 2) + offset
    return PredictedInstance.from_arrays(
        points=pts,
        point_confidences=np.ones(3),
        instance_score=0.9,
        skeleton=skeleton,
    )


@pytest.fixture
def frames(skeleton, video):
    lf0 = LabeledFrame(
        video=video, frame_idx=0, instances=[_pred(skeleton), _pred(skeleton, 1.0)]
    )
    lf1 = LabeledFrame(
        video=video, frame_idx=1, instances=[_pred(skeleton, 2.0), _pred(skeleton, 3.0)]
    )
    return lf0, lf1


def test_instances_list_empty_then_extend_and_rebind(frames):
    lf0, _ = frames
    list_of_instances = list(lf0.instances)

    # Case 1: empty list, no owning frame.
    instances = InstancesList()
    assert len(instances) == 0
    assert instances.labeled_frame is None

    # Extending stamps the (absent) owner onto every member.
    assert isinstance(list_of_instances, list)
    assert not isinstance(list_of_instances, InstancesList)
    instances.extend(list_of_instances)
    assert len(instances) == len(list_of_instances)
    for inst in instances:
        assert inst.frame is None

    # Setting the owner re-stamps every member.
    instances.labeled_frame = lf0
    for inst in instances:
        assert inst.frame is lf0


def test_instances_list_initialized_owner(frames):
    lf0, lf1 = frames

    # Case 2: empty list with an owner at construction.
    instances = InstancesList(labeled_frame=lf0)
    assert len(instances) == 0
    assert instances.labeled_frame is lf0

    # Extending with instances from a DIFFERENT frame re-homes them.
    others = list(lf1.instances)
    instances.extend(others)
    for inst in instances:
        assert inst.frame is lf0

    # Appending an orphan stamps the owner.
    orphan = others[0]
    orphan.frame = None
    prev_len = len(instances)
    instances.append(orphan)
    assert len(instances) == prev_len + 1
    assert instances[-1] is orphan
    assert orphan.frame is lf0

    # copy() returns a PLAIN list (reference contract).
    instances_copy = instances.copy()
    assert len(instances_copy) == len(instances)
    assert isinstance(instances_copy, list)
    assert not isinstance(instances_copy, InstancesList)

    # clear() orphans every member.
    members = list(instances)
    instances.clear()
    assert len(instances) == 0
    for inst in members:
        assert inst.frame is None


def test_instances_list_from_plain_list_has_no_owner(frames):
    lf0, _ = frames
    # Case 3: construction from a plain list with no owner ORPHANS members.
    list_of_instances = list(lf0.instances)
    instances = InstancesList(list_of_instances)
    assert len(instances) == len(list_of_instances)
    assert instances.labeled_frame is None
    for inst in instances:
        assert inst.frame is None


def test_instances_list_mutation_stamps(frames):
    lf0, lf1 = frames
    # Case 4: construction from a list WITH an owner stamps each member.
    donor = list(lf1.instances)
    instances = InstancesList(donor, labeled_frame=lf0)
    assert instances.labeled_frame is lf0
    for inst in instances:
        assert inst.frame is lf0

    # __delitem__ orphans.
    removed = instances[0]
    del instances[0]
    assert removed not in instances
    assert removed.frame is None

    # insert stamps.
    instances.insert(0, removed)
    assert instances[0] is removed
    assert removed.frame is lf0

    # __setitem__ stamps.
    new_instance = lf0.instances[0]
    new_instance.frame = None
    instances[0] = new_instance
    assert instances[0] is new_instance
    assert new_instance.frame is lf0

    # pop orphans.
    popped = instances.pop(0)
    assert popped.frame is None

    # remove orphans.
    target = instances[0]
    instances.remove(target)
    assert target.frame is None
    assert target not in instances


def test_instances_list_from_instances_list_resets_owner(frames):
    lf0, lf1 = frames
    # Case 5: constructing from another InstancesList does NOT inherit the
    # owner — members are orphaned (reference test_instance.py:667-674).
    instances_1 = InstancesList(list(lf1.instances), labeled_frame=lf0)
    instances = InstancesList(instances_1)
    assert len(instances) == len(instances_1)
    assert instances.labeled_frame is None
    for inst in instances:
        assert inst.frame is None


def test_instances_list_append_type_check(frames):
    lf0, _ = frames
    instances = InstancesList(labeled_frame=lf0)
    with pytest.raises(ValueError):
        instances.append("not an instance")


def test_labeled_frame_wraps_and_stamps(skeleton, video, frames):
    lf0, lf1 = frames
    # Construction from a plain list of orphans adopts them.
    instances = list(lf0.instances)
    for inst in instances:
        inst.frame = None
    lf = LabeledFrame(video=video, frame_idx=0, instances=instances)
    assert isinstance(lf.instances, InstancesList)
    assert len(lf.instances) == len(instances)
    for inst in lf.instances:
        assert inst.frame is lf

    # Construction from an InstancesList also re-homes.
    donated = InstancesList(list(lf1.instances))
    lf = LabeledFrame(video=video, frame_idx=1, instances=donated)
    assert isinstance(lf.instances, InstancesList)
    for inst in lf.instances:
        assert inst.frame is lf


def test_labeled_frame_list_delegation(frames):
    lf0, lf1 = frames

    # __len__ / __getitem__ / index
    assert len(lf0) == len(lf0.instances)
    assert lf0[0] is lf0.instances[0]
    assert lf0.index(lf0[0]) == lf0.instances.index(lf0[0]) == 0

    # __delitem__ orphans.
    removed = lf0[0]
    del lf0[0]
    assert removed not in lf0.instances
    assert removed.frame is None

    # __repr__ is printable.
    repr(lf0)

    # insert stamps.
    lf0.insert(0, removed)
    assert lf0[0] is removed
    assert removed.frame is lf0

    # __setitem__ stamps.
    new_instance = lf1[0]
    new_instance.frame = None
    lf0[0] = new_instance
    assert lf0[0] is new_instance
    assert new_instance.frame is lf0


def test_labeled_frame_instances_setter(frames):
    lf0, lf1 = frames

    # Empty-list assignment rebinds ownership to an empty InstancesList.
    lf0.instances = []
    assert len(lf0.instances) == 0
    assert lf0.instances.labeled_frame is lf0

    # InstancesList assignment re-homes every member.
    lf0.instances = lf1.instances
    assert len(lf0.instances) == len(lf1.instances)
    assert lf0.instances.labeled_frame is lf0
    for inst in lf0.instances:
        assert inst.frame is lf0

    # Plain-list assignment too.
    lf0.instances = list(lf1.instances)
    assert lf0.instances.labeled_frame is lf0
    for inst in lf0.instances:
        assert inst.frame is lf0
