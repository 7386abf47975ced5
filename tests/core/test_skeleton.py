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


def test_symmetry_ops(fly_skeleton):
    sk = fly_skeleton
    n = sk.node_names
    # fly fixture has symmetries? Build fresh to be explicit.
    from sleap_tpu.core.skeleton import Skeleton

    s = Skeleton("sym")
    s.add_nodes(["head", "left", "right", "tail"])
    s.add_edge("head", "tail")
    s.add_symmetry("left", "right")
    assert s.symmetry_names == [("left", "right")] or s.symmetry_names == [("right", "left")]
    assert sorted(s.symmetric_inds[0]) == [1, 2]
    assert s.get_symmetry("left").name == "right"
    assert s.get_symmetry("right").name == "left"
    assert s.get_symmetry("head") is None
    # flip_idx maps each node to its mirror (identity for unpaired).
    assert s.flip_idx() == [0, 2, 1, 3]
    s.delete_symmetry("left", "right")
    assert s.symmetries == []
    assert s.flip_idx() == [0, 1, 2, 3]


def test_edge_index_helpers():
    from sleap_tpu.core.skeleton import Skeleton

    s = Skeleton("e")
    s.add_nodes(["a", "b", "c"])
    s.add_edges([("a", "b"), ("b", "c")])
    assert s.n_edges == 2
    assert s.edge_inds == [(0, 1), (1, 2)]
    assert s.edge_to_index("b", "c") == 1
    assert s.has_edge("a", "b") and not s.has_edge("a", "c")
    with pytest.raises(ValueError):
        s.add_edge("a", "b")  # duplicate edge
    with pytest.raises(ValueError):
        s.add_edge("a", "zzz")  # unknown node (reference skeleton.py:1110)
    s.delete_edge("a", "b")
    assert s.edge_inds == [(1, 2)]


def test_delete_node_removes_incident_edges():
    from sleap_tpu.core.skeleton import Skeleton

    s = Skeleton("d")
    s.add_nodes(["a", "b", "c"])
    s.add_edges([("a", "b"), ("b", "c")])
    s.delete_node("b")
    assert s.node_names == ["a", "c"]
    assert s.edges == []


def test_is_arborescence():
    from sleap_tpu.core.skeleton import Skeleton

    s = Skeleton("t")
    s.add_nodes(["a", "b", "c"])
    s.add_edges([("a", "b"), ("a", "c")])
    assert s.is_arborescence
    s.add_edge("b", "c")  # two parents for c
    assert not s.is_arborescence


def test_skeleton_matches_and_eq():
    from sleap_tpu.core.skeleton import Skeleton

    a = Skeleton.from_names_and_edge_inds(["x", "y"], [(0, 1)], name="A")
    b = Skeleton.from_names_and_edge_inds(["x", "y"], [(0, 1)], name="B")
    assert a.matches(b)  # structure match ignores name
    c = Skeleton.from_names_and_edge_inds(["x", "y"], [], name="A")
    assert not a.matches(c)


def test_template_skeletons_load():
    """Shipped template skeletons parse (reference sleap/skeletons/*.json)."""
    from sleap_tpu.core.skeleton import load_template

    for name, n_nodes in [("flies13", 13), ("fly32", 32), ("bees", 21)]:
        sk = load_template(name)
        assert sk.n_nodes == n_nodes, name
        assert sk.n_edges > 0


def test_templates_match_reference_files():
    import os

    ref_dir = "/root/reference/sleap/skeletons"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference skeletons unavailable")
    from sleap_tpu.core.skeleton import Skeleton, load_template

    for fn in os.listdir(ref_dir):
        with open(os.path.join(ref_dir, fn)) as f:
            ref_sk = Skeleton.from_json(f.read())
        ours = load_template(os.path.splitext(fn)[0])
        assert ours.node_names == ref_sk.node_names, fn
        assert ours.edge_inds == ref_sk.edge_inds, fn


def test_load_json_reference_fixture_skeletons(tmp_path):
    """Both fixture encodings (jsonpickle id-refs and pystate dicts) load,
    and save_json/load_json round-trips (reference skeleton.py:1526,1586)."""
    import os

    from sleap_tpu.core.skeleton import Skeleton

    base = "/root/reference/tests/data/skeleton"
    if not os.path.isdir(base):
        pytest.skip("reference skeleton fixtures unavailable")
    sk = Skeleton.load_json(os.path.join(base, "fly_skeleton_legs.json"))
    assert sk.n_nodes == 24 and sk.n_edges == 23
    assert sk.node_names[:3] == ["head", "neck", "thorax"]

    sk_dict = Skeleton.load_json(
        os.path.join(base, "fly_skeleton_legs_pystate_dict.json")
    )
    assert sk_dict.node_names == sk.node_names
    assert sk_dict.edge_inds == sk.edge_inds

    out = str(tmp_path / "fly.json")
    sk.save_json(out)
    sk2 = Skeleton.load_json(out)
    assert sk2.node_names == sk.node_names and sk2.edge_inds == sk.edge_inds


def test_load_mat_and_graph_utils():
    """Skeleton.load_mat on the reference LEAP fixture + graph utilities
    (edges_full, find_neighbors, root_nodes, clear_edges)."""
    import os

    from sleap_tpu.core.skeleton import Skeleton

    p = "/root/reference/tests/data/skeleton/leap_mat_format/skeleton_legs.mat"
    if not os.path.exists(p):
        pytest.skip("reference fixture unavailable")
    sk = Skeleton.load_mat(p)
    assert sk.n_nodes > 0 and sk.n_edges > 0

    full = sk.edges_full
    assert len(full) == sk.n_edges
    src0, dst0 = sk.edges[0]
    assert (full[0][0], full[0][1]) == (src0, dst0)

    neigh = sk.find_neighbors(src0.name)
    assert dst0 in neigh
    # Neighbors include predecessors (body edges in either direction).
    assert src0 in sk.find_neighbors(dst0.name)
    assert sk.find_neighbors("no_such_node") == []

    roots = sk.root_nodes
    assert all(n not in {d for _, d in sk.edges} for n in roots)

    # clear_edges removes only BODY edges; symmetries survive.
    sk.add_symmetry(sk.nodes[0].name, sk.nodes[1].name)
    sk.clear_edges()
    assert sk.n_edges == 0 and sk.n_nodes > 0
    assert len(sk.symmetries) == 1
    assert sk.find_neighbors(sk.nodes[0].name) == []  # symmetry not a neighbor
