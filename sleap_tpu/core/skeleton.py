"""Skeleton data model: a directed graph of body-part nodes.

TPU-native rebuild of the reference skeleton module (see
``/root/reference/sleap/skeleton.py:584`` for the API surface being matched).
Skeletons are host-side metadata only: they never touch the device. The
on-chip code consumes only ``edge_inds`` / ``flip_idx`` integer arrays derived
here.

Serialization must interoperate with the reference's jsonpickle-flavored JSON
in two places:

1. ``.slp`` file ``metadata`` JSON: node-link graphs whose ``source``/``target``
   are integer indices into a separate top-level ``nodes`` list
   (``/root/reference/sleap/io/format/hdf5.py:89``).
2. ``training_config.json`` skeletons: full jsonpickle encoding where nodes are
   ``{"py/object": "sleap.skeleton.Node", "py/state": ...}`` and later
   references are ``{"py/id": N}`` with N 1-indexed over objects in order of
   appearance (``/root/reference/sleap/skeleton.py:88-405``).
"""

from __future__ import annotations

import copy
import json
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import attr
import networkx as nx


class EdgeType:
    """Edge kinds in the skeleton multigraph.

    BODY edges connect body parts; SYMMETRY edges mark left/right pairs used
    by flip augmentation. Mirrors the enum at
    ``/root/reference/sleap/skeleton.py:31``.
    """

    BODY = 1
    SYMMETRY = 2


@attr.s(auto_attribs=True, eq=False, slots=True)
class Node:
    """A landmark/body-part node.

    Identity semantics: two Node objects are the same node only if they are
    the same object (the graph may contain same-named nodes in principle, and
    instances key their points by Node object).
    """

    name: str
    weight: float = 1.0

    @staticmethod
    def from_names(names: Sequence[str]) -> List["Node"]:
        return [Node(name) for name in names]

    def matches(self, other: "Node") -> bool:
        return self.name == other.name and self.weight == other.weight

    def __repr__(self) -> str:
        return f"Node(name={self.name!r}, weight={self.weight})"


class Skeleton:
    """Directed multigraph of nodes with BODY and SYMMETRY edges.

    API surface mirrors ``/root/reference/sleap/skeleton.py:584`` (same
    property names) so downstream code written against the reference maps
    directly; the implementation is fresh.
    """

    def __init__(self, name: Optional[str] = None):
        self._graph = nx.MultiDiGraph(name=name or "Skeleton", num_edges_inserted=0)

    # ------------------------------------------------------------------ #
    # Identity / naming
    # ------------------------------------------------------------------ #
    @property
    def name(self) -> str:
        return self._graph.graph["name"]

    @name.setter
    def name(self, value: str) -> None:
        self._graph.graph["name"] = value

    @property
    def graph(self) -> nx.MultiDiGraph:
        return self._graph

    @property
    def is_arborescence(self) -> bool:
        """True if the BODY subgraph is a tree rooted at a single source."""
        return nx.algorithms.tree.recognition.is_arborescence(self.body_graph)

    @property
    def body_graph(self) -> nx.MultiDiGraph:
        g = nx.MultiDiGraph()
        g.add_nodes_from(self.nodes)
        g.add_edges_from(self.edges)
        return g

    def __repr__(self) -> str:
        return (
            f"Skeleton(name={self.name!r}, "
            f"nodes={self.node_names!r}, edges={self.edge_names!r})"
        )

    def __contains__(self, node_name: str) -> bool:
        return self.has_node(node_name)

    # NOTE: equality is IDENTITY, like the reference (skeleton.py defines no
    # __eq__ and hashes by id, skeleton.py:1771). Distinct-but-identical
    # skeletons must NOT merge in Labels registries; use :meth:`matches` for
    # structural comparison.
    def __hash__(self) -> int:
        return id(self)

    # ------------------------------------------------------------------ #
    # Nodes
    # ------------------------------------------------------------------ #
    @property
    def nodes(self) -> List[Node]:
        return list(self._graph.nodes())

    @property
    def node_names(self) -> List[str]:
        return [n.name for n in self.nodes]

    @property
    def n_nodes(self) -> int:
        return self._graph.number_of_nodes()

    def node_to_index(self, node: Union[str, Node]) -> int:
        nodes = self.nodes
        if isinstance(node, Node):
            return nodes.index(node)
        return self.node_names.index(node)

    def find_node(self, name: Union[str, Node]) -> Optional[Node]:
        if isinstance(name, Node):
            name = name.name
        for n in self.nodes:
            if n.name == name:
                return n
        return None

    def has_node(self, name: str) -> bool:
        return self.find_node(name) is not None

    def has_nodes(self, names: Iterable[str]) -> bool:
        return all(self.has_node(n) for n in names)

    def add_node(self, name: str) -> None:
        if not isinstance(name, str):
            raise TypeError("Node name must be a string.")
        if self.has_node(name):
            raise ValueError(f"Skeleton already has a node named ({name}).")
        self._graph.add_node(Node(name))

    def add_nodes(self, names: Iterable[str]) -> None:
        for name in names:
            self.add_node(name)

    def delete_node(self, name: str) -> None:
        node = self.find_node(name)
        if node is None:
            raise ValueError(f"The node named ({name}) isn't in the skeleton.")
        self._graph.remove_node(node)

    def relabel_node(self, old_name: str, new_name: str) -> None:
        self.relabel_nodes({old_name: new_name})

    def relabel_nodes(self, mapping: Dict[str, str]) -> None:
        existing = set(self.node_names) - set(mapping.keys())
        for new_name in mapping.values():
            if new_name in existing:
                raise ValueError("Cannot relabel a node to an existing name.")
        for old_name, new_name in mapping.items():
            node = self.find_node(old_name)
            if node is None:
                raise ValueError(f"The node named ({old_name}) isn't in the skeleton.")
            node.name = new_name

    # ------------------------------------------------------------------ #
    # Edges (BODY)
    # ------------------------------------------------------------------ #
    def _edges_of_type(self, edge_type: int) -> List[Tuple[Node, Node]]:
        return [
            (src, dst)
            for src, dst, attrs in self._graph.edges(data=True)
            if attrs.get("type") == edge_type
        ]

    @property
    def edges(self) -> List[Tuple[Node, Node]]:
        edge_list = [
            (attrs.get("edge_insert_idx", i), src, dst)
            for i, (src, dst, attrs) in enumerate(self._graph.edges(data=True))
            if attrs.get("type") == EdgeType.BODY
        ]
        edge_list.sort(key=lambda t: (t[0] is None, t[0]))
        return [(src, dst) for _, src, dst in edge_list]

    @property
    def edge_names(self) -> List[Tuple[str, str]]:
        return [(s.name, d.name) for s, d in self.edges]

    @property
    def edge_inds(self) -> List[Tuple[int, int]]:
        """Edges as (src_index, dst_index) node-index pairs.

        This is the array the on-chip PAF codecs consume.
        """
        nodes = self.nodes
        return [(nodes.index(s), nodes.index(d)) for s, d in self.edges]

    @property
    def n_edges(self) -> int:
        return len(self.edges)

    def edge_to_index(self, source: Union[str, Node], destination: Union[str, Node]) -> int:
        source = self.find_node(source)
        destination = self.find_node(destination)
        try:
            return self.edges.index((source, destination))
        except ValueError:
            return -1

    def has_edge(self, source_name: str, dest_name: str) -> bool:
        src, dst = self.find_node(source_name), self.find_node(dest_name)
        return (
            src is not None
            and dst is not None
            and self._graph.has_edge(src, dst)
            and any(
                a.get("type") == EdgeType.BODY
                for a in self._graph.get_edge_data(src, dst).values()
            )
        )

    def add_edge(self, source: Union[str, Node], destination: Union[str, Node]) -> None:
        if isinstance(source, Node):
            source = source.name
        if isinstance(destination, Node):
            destination = destination.name

        # Reference parity (skeleton.py:1110-1118): unknown endpoints are an
        # error, not an implicit add_node.
        src_node = self.find_node(source)
        if src_node is None:
            raise ValueError(f"Skeleton does not have source node named ({source}).")
        dst_node = self.find_node(destination)
        if dst_node is None:
            raise ValueError(
                f"Skeleton does not have destination node named ({destination})."
            )

        if self.has_edge(source, destination):
            raise ValueError(f"Skeleton already has an edge between ({source}) and ({destination}).")

        idx = self._graph.graph["num_edges_inserted"]
        self._graph.graph["num_edges_inserted"] = idx + 1
        self._graph.add_edge(src_node, dst_node, type=EdgeType.BODY, edge_insert_idx=idx)

    def add_edges(self, edges: Iterable[Tuple[str, str]]) -> None:
        for src, dst in edges:
            self.add_edge(src, dst)

    def delete_edge(self, source: Union[str, Node], destination: Union[str, Node]) -> None:
        if isinstance(source, Node):
            source = source.name
        if isinstance(destination, Node):
            destination = destination.name
        if not self.has_edge(source, destination):
            raise ValueError(f"Skeleton has no edge between ({source}) and ({destination}).")
        src, dst = self.find_node(source), self.find_node(destination)
        for key, attrs in list(self._graph.get_edge_data(src, dst).items()):
            if attrs.get("type") == EdgeType.BODY:
                self._graph.remove_edge(src, dst, key=key)

    # ------------------------------------------------------------------ #
    # Symmetries
    # ------------------------------------------------------------------ #
    @property
    def symmetries(self) -> List[Tuple[Node, Node]]:
        """Unique unordered symmetric node pairs."""
        pairs = self._edges_of_type(EdgeType.SYMMETRY)
        seen, out = set(), []
        for a, b in pairs:
            key = frozenset((id(a), id(b)))
            if key not in seen:
                seen.add(key)
                out.append((a, b))
        return out

    @property
    def symmetry_names(self) -> List[Tuple[str, str]]:
        return [(a.name, b.name) for a, b in self.symmetries]

    @property
    def symmetric_inds(self) -> List[Tuple[int, int]]:
        nodes = self.nodes
        return [(nodes.index(a), nodes.index(b)) for a, b in self.symmetries]

    def add_symmetry(self, node1: str, node2: str) -> None:
        if node1 == node2:
            raise ValueError("Cannot add symmetry to the same node.")
        if self.get_symmetry(node1) is not None:
            raise ValueError(f"{node1} is already symmetric with {self.get_symmetry(node1).name}.")
        if self.get_symmetry(node2) is not None:
            raise ValueError(f"{node2} is already symmetric with {self.get_symmetry(node2).name}.")
        a, b = self.find_node(node1), self.find_node(node2)
        if a is None or b is None:
            raise ValueError("Both nodes must exist to add a symmetry.")
        self._graph.add_edge(a, b, type=EdgeType.SYMMETRY)
        self._graph.add_edge(b, a, type=EdgeType.SYMMETRY)

    def delete_symmetry(self, node1: Union[str, Node], node2: Union[str, Node]) -> None:
        a = self.find_node(node1) if not isinstance(node1, Node) else node1
        b = self.find_node(node2) if not isinstance(node2, Node) else node2
        if (a, b) not in self.symmetries and (b, a) not in self.symmetries:
            raise ValueError(f"Nodes are not symmetric.")
        for u, v in ((a, b), (b, a)):
            if self._graph.has_edge(u, v):
                for key, attrs in list(self._graph.get_edge_data(u, v).items()):
                    if attrs.get("type") == EdgeType.SYMMETRY:
                        self._graph.remove_edge(u, v, key=key)

    def get_symmetry(self, name: Union[str, Node]) -> Optional[Node]:
        node = self.find_node(name) if not isinstance(name, Node) else name
        for a, b in self.symmetries:
            if a is node:
                return b
            if b is node:
                return a
        return None

    def flip_idx(self) -> List[int]:
        """Per-node index of the symmetric partner (identity where unpaired).

        Used by flip augmentation on-chip (reference analog:
        ``/root/reference/sleap/nn/data/augmentation.py:13``).
        """
        idx = list(range(self.n_nodes))
        for a, b in self.symmetric_inds:
            idx[a], idx[b] = b, a
        return idx

    # ------------------------------------------------------------------ #
    # Comparison
    # ------------------------------------------------------------------ #
    def matches(self, other: "Skeleton") -> bool:
        """Structural equality: same node names, edges, and symmetries."""
        return (
            set(self.node_names) == set(other.node_names)
            and set(map(tuple, self.edge_names)) == set(map(tuple, other.edge_names))
            and {frozenset(p) for p in self.symmetry_names}
            == {frozenset(p) for p in other.symmetry_names}
        )

    # ------------------------------------------------------------------ #
    # Serialization
    # ------------------------------------------------------------------ #
    def to_dict(self, node_to_idx: Optional[Dict[Node, int]] = None) -> Dict[str, Any]:
        """Encode as a node-link dict compatible with the reference format.

        If ``node_to_idx`` is given, nodes are encoded as integer indices
        (the ``.slp`` metadata style); otherwise as jsonpickle ``py/object`` /
        ``py/id`` records (the ``training_config.json`` style).
        """
        encoder = _JsonpickleEncoder()
        links = []
        for i, (src, dst) in enumerate(self.edges):
            links.append(
                {
                    "edge_insert_idx": i,
                    "key": 0,
                    "source": encoder.encode_node(src, node_to_idx),
                    "target": encoder.encode_node(dst, node_to_idx),
                    "type": encoder.encode_edge_type(EdgeType.BODY),
                }
            )
        for src, dst in self.symmetries:
            # Symmetry edges are stored both ways in the graph; encode both
            # directed records like the reference does.
            for a, b in ((src, dst), (dst, src)):
                links.append(
                    {
                        "key": 0,
                        "source": encoder.encode_node(a, node_to_idx),
                        "target": encoder.encode_node(b, node_to_idx),
                        "type": encoder.encode_edge_type(EdgeType.SYMMETRY),
                    }
                )
        if node_to_idx is not None:
            nodes = [{"id": node_to_idx[n]} for n in self.nodes]
        else:
            nodes = [{"id": encoder.encode_node(n, None)} for n in self.nodes]
        return {
            "directed": True,
            "graph": {
                "name": self.name,
                "num_edges_inserted": self._graph.graph.get("num_edges_inserted", self.n_edges),
            },
            "links": links,
            "multigraph": True,
            "nodes": nodes,
        }

    def to_json(self, node_to_idx: Optional[Dict[Node, int]] = None) -> str:
        return json.dumps(self.to_dict(node_to_idx))

    @classmethod
    def from_dict(
        cls, d: Dict[str, Any], node_list: Optional[List[Node]] = None
    ) -> "Skeleton":
        """Decode a node-link dict in either serialization style.

        Args:
            d: the node-link dict.
            node_list: when nodes are encoded as integer indices (``.slp``
                style), the shared Node list those indices refer to.
        """
        # Template-style skeletons wrap the node-link dict in an "nx_graph"
        # key alongside description/preview_image (reference skeleton.py:344).
        if "nx_graph" in d:
            d = d["nx_graph"]
        decoder = _JsonpickleDecoder(node_list)
        skel = cls(name=d.get("graph", {}).get("name"))
        skel._graph.graph["num_edges_inserted"] = d.get("graph", {}).get(
            "num_edges_inserted", 0
        )
        links = []
        for link in d.get("links", []):
            src = decoder.decode_node(link["source"])
            dst = decoder.decode_node(link["target"])
            etype = decoder.decode_edge_type(link["type"])
            links.append((link.get("edge_insert_idx"), src, dst, etype))
        # Declared node order defines node indices.
        for nd in d.get("nodes", []):
            node = decoder.decode_node(nd["id"])
            skel._graph.add_node(node)
        seen_sym = set()
        for insert_idx, src, dst, etype in links:
            if etype == EdgeType.BODY:
                skel._graph.add_edge(
                    src, dst, type=EdgeType.BODY, edge_insert_idx=insert_idx
                )
            else:
                key = frozenset((id(src), id(dst)))
                if key not in seen_sym:
                    seen_sym.add(key)
                    skel._graph.add_edge(src, dst, type=EdgeType.SYMMETRY)
                    skel._graph.add_edge(dst, src, type=EdgeType.SYMMETRY)
        return skel

    @classmethod
    def from_json(cls, json_str: str, node_list: Optional[List[Node]] = None) -> "Skeleton":
        return cls.from_dict(json.loads(json_str), node_list)

    @classmethod
    def load_mat(cls, filename: str) -> "Skeleton":
        """Load a legacy LEAP MATLAB skeleton (reference skeleton.py:1738):
        ``nodeNames`` cell array + 1-based ``edges`` matrix."""
        from scipy.io import loadmat

        import numpy as np

        mat = loadmat(filename)
        node_names = [str(n[0][0]) for n in mat["nodeNames"]]
        skeleton = cls(name=filename)
        skeleton.add_nodes(node_names)
        for src, dst in np.asarray(mat["edges"]) - 1:
            skeleton.add_edge(node_names[int(src)], node_names[int(dst)])
        return skeleton

    @property
    def edges_full(self) -> List[Tuple[Node, Node, Any, Any]]:
        """(src, dst, key, attrs) tuples for body edges, in the same
        insert-order as :attr:`edges` (reference skeleton.py edges_full)."""
        edge_list = [
            (attrs.get("edge_insert_idx", i), src, dst, key, attrs)
            for i, (src, dst, key, attrs) in enumerate(
                self._graph.edges(keys=True, data=True)
            )
            if attrs.get("type") == EdgeType.BODY
        ]
        edge_list.sort(key=lambda t: (t[0] is None, t[0]))
        return [(src, dst, key, attrs) for _, src, dst, key, attrs in edge_list]

    def find_neighbors(self, node: Union[str, Node]) -> List[Node]:
        """Nodes connected to ``node`` by a BODY edge, either direction
        (reference skeleton.py graph neighbors; symmetry edges excluded)."""
        node = self.find_node(node)
        if node is None:
            return []
        out = []
        for src, dst in self.edges:
            if src is node and dst not in out:
                out.append(dst)
            elif dst is node and src not in out:
                out.append(src)
        return out

    @property
    def root_nodes(self) -> List[Node]:
        """Nodes with no incoming body edges."""
        targets = {dst for _, dst in self.edges}
        return [n for n in self.nodes if n not in targets]

    def clear_edges(self) -> None:
        """Remove all BODY edges, keeping nodes and symmetries (reference
        skeleton.py iterates self.edges, which is body-only)."""
        body = [
            (src, dst, key)
            for src, dst, key, attrs in self._graph.edges(keys=True, data=True)
            if attrs.get("type") == EdgeType.BODY
        ]
        self._graph.remove_edges_from(body)

    def save_json(self, filename: str, node_to_idx: Optional[Dict[Node, int]] = None) -> None:
        """Write the skeleton to a JSON file (reference skeleton.py:1526)."""
        with open(filename, "w") as f:
            f.write(self.to_json(node_to_idx))

    @classmethod
    def load_json(
        cls, filename: str, idx_to_node: Optional[Dict[int, Node]] = None
    ) -> "Skeleton":
        """Load a skeleton from a JSON file (reference skeleton.py:1586)."""
        node_list = None
        if idx_to_node:
            node_list = [idx_to_node[i] for i in range(len(idx_to_node))]
        with open(filename, "r") as f:
            return cls.from_json(f.read(), node_list)

    @classmethod
    def from_names_and_edge_inds(
        cls,
        node_names: Sequence[str],
        edge_inds: Optional[Sequence[Tuple[int, int]]] = None,
        name: Optional[str] = None,
    ) -> "Skeleton":
        skel = cls(name=name)
        skel.add_nodes(node_names)
        for s, d in edge_inds or []:
            skel.add_edge(node_names[s], node_names[d])
        return skel


class _JsonpickleDecoder:
    """Decodes jsonpickle-style Node/EdgeType records.

    ``py/id`` values are 1-indexed over decoded objects in order of
    appearance (matching ``/root/reference/sleap/skeleton.py:403-405``).
    """

    def __init__(self, node_list: Optional[List[Node]] = None):
        self._objects: List[Any] = []
        self._node_list = node_list

    def decode_node(self, encoded: Any) -> Node:
        if isinstance(encoded, int):
            if self._node_list is None:
                raise ValueError("Integer node reference without a node list.")
            return self._node_list[encoded]
        if isinstance(encoded, str):
            node = Node(encoded)
            self._objects.append(node)
            return node
        if "py/object" in encoded:
            state = encoded["py/state"]
            if "py/tuple" in state:
                node = Node(name=state["py/tuple"][0], weight=state["py/tuple"][1])
            else:
                node = Node(name=state["name"], weight=state.get("weight", 1.0))
            self._objects.append(node)
            return node
        if "py/id" in encoded:
            return self._objects[encoded["py/id"] - 1]
        raise ValueError(f"Cannot decode node record: {encoded!r}")

    def decode_edge_type(self, encoded: Any) -> int:
        if isinstance(encoded, int):
            return encoded
        if "py/reduce" in encoded:
            etype = encoded["py/reduce"][1]["py/tuple"][0]
            self._objects.append(etype)
            return etype
        if "py/id" in encoded:
            return self._objects[encoded["py/id"] - 1]
        raise ValueError(f"Cannot decode edge type record: {encoded!r}")


class _JsonpickleEncoder:
    """Encodes Node/EdgeType records jsonpickle-style with 1-indexed py/ids."""

    def __init__(self):
        self._py_ids: Dict[int, int] = {}
        self._count = 0

    def _get_or_assign(self, obj: Any) -> Tuple[int, bool]:
        key = id(obj)
        if key in self._py_ids:
            return self._py_ids[key], False
        self._count += 1
        self._py_ids[key] = self._count
        return self._count, True

    def encode_node(self, node: Node, node_to_idx: Optional[Dict[Node, int]]) -> Any:
        if node_to_idx is not None:
            return node_to_idx[node]
        py_id, first = self._get_or_assign(node)
        if first:
            return {
                "py/object": "sleap.skeleton.Node",
                "py/state": {"py/tuple": [node.name, node.weight]},
            }
        return {"py/id": py_id}

    def encode_edge_type(self, edge_type: int) -> Any:
        py_id, first = self._get_or_assign(
            _EDGE_TYPE_SINGLETONS.setdefault(edge_type, object())
        )
        if first:
            return {
                "py/reduce": [
                    {"py/type": "sleap.skeleton.EdgeType"},
                    {"py/tuple": [edge_type]},
                ]
            }
        return {"py/id": py_id}


_EDGE_TYPE_SINGLETONS: Dict[int, object] = {}


def load_template(name: str) -> Skeleton:
    """Load a shipped template skeleton (e.g. "flies13", "mice_hc").

    Reference ships the same templates as data in ``sleap/skeletons/*.json``.
    """
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "skeletons",
        f"{name}.json",
    )
    if not os.path.exists(path):
        available = [
            f[:-5]
            for f in os.listdir(os.path.dirname(path))
            if f.endswith(".json")
        ]
        raise FileNotFoundError(
            f"No template skeleton {name!r}; available: {sorted(available)}"
        )
    data = json.load(open(path))
    skel = Skeleton.from_dict(data["nx_graph"])
    skel.name = name
    return skel
