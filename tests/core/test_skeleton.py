import json

import pytest

from sleap_tpu.core.skeleton import EdgeType, Node, Skeleton


@pytest.fixture
def fly_skeleton():
    skel = Skeleton(name="fly")
    skel.add_nodes(["head", "thorax", "abdomen", "wingL", "wingR"])
    skel.add_edge("head", "thorax")
    skel.add_edge("thorax", "abdomen")
    skel.add_edge("thorax", "wingL")
    skel.add_edge("thorax", "wingR")
    skel.add_symmetry("wingL", "wingR")
    return skel


def test_basic_properties(fly_skeleton):
    assert fly_skeleton.n_nodes == 5
    assert fly_skeleton.n_edges == 4
    assert fly_skeleton.node_names == ["head", "thorax", "abdomen", "wingL", "wingR"]
    assert fly_skeleton.edge_inds == [(0, 1), (1, 2), (1, 3), (1, 4)]
    assert fly_skeleton.symmetric_inds == [(3, 4)]
    assert fly_skeleton.flip_idx() == [0, 1, 2, 4, 3]
    assert "head" in fly_skeleton
    assert "tail" not in fly_skeleton


def test_add_delete(fly_skeleton):
    fly_skeleton.add_node("tail")
    assert fly_skeleton.n_nodes == 6
    with pytest.raises(ValueError):
        fly_skeleton.add_node("tail")
    fly_skeleton.delete_node("tail")
    assert fly_skeleton.n_nodes == 5

    with pytest.raises(ValueError):
        fly_skeleton.add_edge("head", "thorax")
    fly_skeleton.delete_edge("head", "thorax")
    assert fly_skeleton.n_edges == 3

    fly_skeleton.delete_symmetry("wingL", "wingR")
    assert fly_skeleton.symmetric_inds == []


def test_relabel(fly_skeleton):
    fly_skeleton.relabel_node("head", "rostrum")
    assert "rostrum" in fly_skeleton.node_names
    # Edges follow the node object through renames.
    assert fly_skeleton.edge_names[0] == ("rostrum", "thorax")


def test_json_roundtrip_slp_style(fly_skeleton):
    nodes = fly_skeleton.nodes
    node_to_idx = {n: i for i, n in enumerate(nodes)}
    js = fly_skeleton.to_json(node_to_idx)
    restored = Skeleton.from_json(js, node_list=nodes)
    assert restored.matches(fly_skeleton)
    assert restored.edge_inds == fly_skeleton.edge_inds
    assert restored.symmetric_inds == fly_skeleton.symmetric_inds


def test_json_roundtrip_jsonpickle_style(fly_skeleton):
    js = fly_skeleton.to_json()
    restored = Skeleton.from_json(js)
    assert restored.matches(fly_skeleton)
    assert restored.node_names == fly_skeleton.node_names


def test_decode_reference_training_config_skeleton():
    """Decode the py/object-style skeleton embedded in reference configs."""
    import os

    path = (
        "/root/reference/tests/data/models/minimal_instance.UNet.centroid/"
        "training_config.json"
    )
    if not os.path.exists(path):
        pytest.skip("reference fixture unavailable")
    cfg = json.load(open(path))
    skel = Skeleton.from_dict(cfg["data"]["labels"]["skeletons"][0])
    assert skel.node_names == ["A", "B"]
    assert skel.edge_inds == [(0, 1)]


def test_from_names_and_edge_inds():
    skel = Skeleton.from_names_and_edge_inds(
        ["a", "b", "c"], [(0, 1), (1, 2)], name="test"
    )
    assert skel.n_nodes == 3
    assert skel.edge_inds == [(0, 1), (1, 2)]
    assert skel.is_arborescence
