"""Part-affinity-field grouping: peaks -> multi-instance poses.

Rebuild of ``/root/reference/sleap/nn/paf_grouping.py`` with a TPU-native
static-shape layout. The reference operates on flat ragged peak lists with two
py_function graph breaks (scipy Hungarian at :639, numpy assembly at :1115).
Here:

- Peaks arrive channel-grouped with a static bound K per node
  (from :func:`sleap_tpu.ops.peak_finding.find_local_peaks`), so connection
  candidates are simply all (K x K) pairs per edge — no ragged bookkeeping.
- Line-integral scoring (:func:`score_paf_lines_batch`) and Hungarian matching
  (:func:`match_candidates_batch`, via the on-chip LAP solver) run fully
  jitted, shaped (samples, n_edges, K, K).
- Greedy instance assembly (inherently sequential union-find-ish dict logic,
  reference :799-914) runs on host numpy over the tiny matched-connection
  lists; scores/coordinates were already computed on-chip.

Scoring semantics match the reference exactly: n_line_points samples between
peak pairs, nearest-pixel PAF lookup, mean dot product with the unit
displacement, distance penalty ``min(max_len/dist - 1, 0) * weight``
(:278-404), and matching on the full score matrix with NaN->inf costs
(:553-671) followed by ``min_line_scores`` filtering (:1067).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import attr
import jax
import jax.numpy as jnp
import numpy as np

from sleap_tpu.ops.lap import PAD_COST, batched_solve_lap


def toposort_edges(edge_inds: Sequence[Tuple[int, int]]) -> Tuple[int, ...]:
    """Topological-then-BFS edge ordering (reference :1293)."""
    import networkx as nx

    edges = [tuple(e) for e in edge_inds]
    dg = nx.DiGraph(edges)
    root_ind = next(nx.topological_sort(dg))
    sorted_edges = nx.bfs_edges(dg, root_ind)
    return tuple(edges.index(edge) for edge in sorted_edges)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_line_points",
        "pafs_stride",
        "max_edge_length_ratio",
        "dist_penalty_weight",
    ),
)
def score_paf_lines_batch(
    pafs: jnp.ndarray,
    peaks: jnp.ndarray,
    edge_inds: jnp.ndarray,
    n_line_points: int = 10,
    pafs_stride: int = 1,
    max_edge_length_ratio: float = 0.25,
    dist_penalty_weight: float = 1.0,
) -> jnp.ndarray:
    """Score all candidate connections for every edge.

    Args:
        pafs: (S, H', W', 2 * n_edges) PAFs at stride ``pafs_stride``.
        peaks: (S, n_nodes, K, 2) xy peaks in image scale (NaN = missing).
        edge_inds: (n_edges, 2) int (src_node, dst_node).

    Returns:
        (S, n_edges, K, K) penalized line scores; NaN where either endpoint
        is missing.
    """
    S, Hs, Ws, _ = pafs.shape
    E = edge_inds.shape[0]
    K = peaks.shape[2]
    max_edge_length = (
        max_edge_length_ratio * float(max(pafs.shape[1:])) * pafs_stride
    )

    src = jnp.take(peaks, edge_inds[:, 0], axis=1)  # (S, E, K, 2)
    dst = jnp.take(peaks, edge_inds[:, 1], axis=1)

    src_e = src[:, :, :, None, :]  # (S, E, K, 1, 2)
    dst_e = dst[:, :, None, :, :]  # (S, E, 1, K, 2)

    # Line sample points (nearest-pixel subscripts into the PAF grid).
    t = jnp.linspace(0.0, 1.0, n_line_points).reshape(1, 1, 1, 1, -1, 1)
    xy = src_e[..., None, :] + (dst_e - src_e)[..., None, :] * t  # (S,E,K,K,P,2)
    cols = jnp.round(xy[..., 0] / pafs_stride).astype(jnp.int32)
    rows = jnp.round(xy[..., 1] / pafs_stride).astype(jnp.int32)
    cols = jnp.clip(jnp.nan_to_num(cols), 0, Ws - 1)
    rows = jnp.clip(jnp.nan_to_num(rows), 0, Hs - 1)

    # Nearest-pixel PAF lookup as one-hot MATMULS, not a gather: element
    # gathers cost ~1.4 ms/batch on TPU (profiled) while the equivalent
    # row-mix (P', Hs) @ (Hs, Ws) contraction runs on the MXU in <0.2 ms.
    # One-hot row/col weights come from the hat function at integer coords.
    # When the model already runs in bf16 the intermediates stay bf16 (the
    # one-hot weights are exactly representable 0/1, coords < 256 are exact,
    # and the row-select keeps the bf16 PAF values bit-exact), halving the
    # HBM traffic of the big (S, E, P', Hs/Ws) weight/row-mix tensors. For
    # f32 models (reference-parity path) everything stays f32.
    dt = jnp.bfloat16 if pafs.dtype == jnp.bfloat16 else jnp.float32
    n_samp = K * K * n_line_points
    ri = rows.reshape(S, E, n_samp).astype(dt)  # (S, E, P')
    ci = cols.reshape(S, E, n_samp).astype(dt)
    wy = jnp.maximum(
        dt(0.0), 1.0 - jnp.abs(ri[..., None] - jnp.arange(Hs, dtype=dt))
    )  # (S, E, P', Hs) — exactly one 1 per row (integer coords)
    # wx is generated TRANSPOSED — (S, E, Ws, P') — so its natural layout
    # (P' in lanes, Ws in sublanes) is exactly the physical layout the
    # column-select dot wants for this operand. Generated in the logical
    # (S, E, P', Ws) orientation, XLA materializes the 500 MB hat tensor in
    # standard layout and then inserts a full relayout copy (copy.520 in the
    # batch-256 trace, 1.6 ms/iter) before the dot; orienting the generator
    # itself makes the copy fold away.
    wxT = jnp.maximum(
        dt(0.0), 1.0 - jnp.abs(ci[:, :, None, :] - jnp.arange(Ws, dtype=dt)[:, None])
    )  # (S, E, Ws, P')
    paf_e = pafs.reshape(S, Hs, Ws, E, 2)
    row_mix = jnp.einsum(
        "seph,shwec->sepwc", wy, paf_e, preferred_element_type=dt
    )  # (S, E, P', Ws, 2); one-hot row-select keeps values exact
    # Column-select: exactly ONE nonzero term per output, so accumulating in
    # dt is exact too. Requesting f32 accumulation here made XLA materialize
    # f32 copies of the (S, E, P', Ws) one-hot (~2 GB, ~4.4 ms/iter at batch
    # 256 in the trace: copy.382 + fusion.193) purely to feed the dot.
    sampled = jnp.einsum(
        "sepwc,sewp->sepc", row_mix, wxT, preferred_element_type=dt
    ).astype(jnp.float32)  # (S, E, P', 2)
    paf_x = sampled[..., 0].reshape(S, E, K, K, -1)
    paf_y = sampled[..., 1].reshape(S, E, K, K, -1)

    disp = dst_e - src_e  # (S, E, K, K, 2)
    length = jnp.sqrt(jnp.sum(jnp.square(disp), axis=-1, keepdims=True))
    unit = disp / length

    line_scores = paf_x * unit[..., 0:1] + paf_y * unit[..., 1:2]  # (S,E,K,K,P)
    mean_scores = jnp.mean(line_scores, axis=-1)

    penalty = (
        jnp.minimum(max_edge_length / length[..., 0] - 1.0, 0.0) * dist_penalty_weight
    )
    return mean_scores + penalty  # NaN propagates from missing peaks


@jax.jit
def match_candidates_batch(
    scores: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hungarian matching per (sample, edge) on the negated score matrix.

    Args:
        scores: (S, E, K, K); NaN marks invalid candidate pairs.

    Returns:
        dst_for_src: (S, E, K) int32 matched destination peak per source peak.
        match_scores: (S, E, K) the (un-negated) line score of each match.
        match_valid: (S, E, K) bool — True where the match used a real entry.
    """
    S, E, K, _ = scores.shape
    cost = jnp.where(jnp.isnan(scores), PAD_COST, -scores)
    col4row, _ = batched_solve_lap(cost.reshape(S * E, K, K))
    dst_for_src = col4row.reshape(S, E, K)
    # One-hot where-sum instead of a gather (tiny-tensor gathers carry fixed
    # XLA overhead on TPU; NaN-safe select, see group_instances_batch).
    pick_oh = col4row[..., None] == jnp.arange(K, dtype=jnp.int32)
    picked = jnp.sum(
        jnp.where(pick_oh, scores.reshape(S * E, K, K), 0.0), axis=2
    )
    match_scores = picked.reshape(S, E, K)
    match_valid = ~jnp.isnan(match_scores)
    return dst_for_src, match_scores, match_valid


# --------------------------------------------------------------------------- #
# On-chip assembly
# --------------------------------------------------------------------------- #


@functools.partial(
    jax.jit,
    static_argnames=(
        "edge_inds_tuple",
        "sorted_edge_inds",
        "min_line_scores",
        "min_instance_peaks",
        "max_instances",
    ),
)
def group_instances_batch(
    peaks: jnp.ndarray,
    peak_vals: jnp.ndarray,
    dst_for_src: jnp.ndarray,
    match_scores: jnp.ndarray,
    edge_inds_tuple: Tuple[Tuple[int, int], ...],
    sorted_edge_inds: Tuple[int, ...],
    min_line_scores: float = 0.25,
    min_instance_peaks: int = 0,
    max_instances: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Greedy instance assembly fully on-chip (SURVEY §7.5c).

    Replicates the reference's sequential dict-based union
    (``/root/reference/sleap/nn/paf_grouping.py:799-914``) as a masked
    fixed-iteration ``lax.scan`` over the (edge, src_peak) steps, batched
    over samples. State is a per-slot instance label (S, N, K) plus an
    insertion stamp that reproduces the reference's dict-insertion-order
    overwrite rule when one instance holds two peaks of the same node.

    Args:
        peaks: (S, N, K, 2) xy peaks (NaN-padded).
        peak_vals: (S, N, K) peak confidences.
        dst_for_src: (S, E, K) matched destination peak per source peak.
        match_scores: (S, E, K) line scores; NaN where the match is padding.
        edge_inds_tuple: static ((src_node, dst_node), ...) per edge.
        sorted_edge_inds: static assembly order over edges (toposort).
        max_instances: static output bound M; defaults to the structural
            maximum N*K//2 + 1 (each new instance consumes two free slots).

    Returns:
        dict with ``instances`` (S, M, N, 2), ``instance_peak_vals``
        (S, M, N), ``instance_scores`` (S, M), ``instance_valid`` (S, M)
        — instances ordered by creation (ascending original id), NaN/False
        padded.
    """
    S, N, K, _ = peaks.shape
    E = len(edge_inds_tuple)
    M = max_instances if max_instances is not None else N * K // 2 + 1
    T = len(sorted_edge_inds) * K  # total assembly steps

    # Static per-step metadata, laid out as scan inputs.
    step_e = np.repeat(np.asarray(sorted_edge_inds, np.int32), K)
    step_k = np.tile(np.arange(K, dtype=np.int32), len(sorted_edge_inds))
    src_nodes = np.asarray([edge_inds_tuple[e][0] for e in step_e], np.int32)
    dst_nodes = np.asarray([edge_inds_tuple[e][1] for e in step_e], np.int32)
    xs = (
        jnp.asarray(step_e),
        jnp.asarray(step_k),
        jnp.asarray(src_nodes),
        jnp.asarray(dst_nodes),
        jnp.arange(T, dtype=jnp.int32),
    )

    valid_conn = match_scores >= min_line_scores  # False for NaN padding
    col_iota = jnp.arange(K, dtype=jnp.int32)

    def step(carry, x):
        labels, stamps, next_id = carry
        e, k, sn, dn = x[0], x[1], x[2], x[3]
        t = x[4]
        ok = valid_conn[:, e, k]  # (S,)
        dk = dst_for_src[:, e, k]  # (S,)

        sl = labels[:, sn, k]  # (S,) label of the source slot
        dl = jnp.take_along_axis(labels[:, dn, :], dk[:, None], axis=1)[:, 0]

        fresh = ok & (sl < 0) & (dl < 0)
        extend = ok & (sl >= 0) & (dl < 0)
        join = ok & (sl >= 0) & (dl >= 0)
        # (src unassigned, dst assigned) intentionally does nothing —
        # reference behavior (paf_grouping.py:828-848 has no such branch).

        # Source slot: only the both-new case writes it.
        labels = labels.at[:, sn, k].set(jnp.where(fresh, next_id, sl))
        stamps = stamps.at[:, sn, k].set(
            jnp.where(fresh, 2 * t, stamps[:, sn, k])
        )

        # Destination slot (per-sample column dk): fresh -> new id,
        # extend/join -> the source's label. Stamp only on first insertion
        # (fresh/extend); join overwrites the value of an existing key.
        # The row is re-read after the source write so sn == dn stays safe.
        dst_label = jnp.where(fresh, next_id, sl)
        write_dst = fresh | extend | join
        col_hit = (col_iota[None, :] == dk[:, None]) & write_dst[:, None]
        new_dst_row = jnp.where(col_hit, dst_label[:, None], labels[:, dn, :])
        labels = labels.at[:, dn, :].set(new_dst_row)
        stamp_row = stamps[:, dn, :]
        stamp_hit = col_hit & (fresh | extend)[:, None]
        stamps = stamps.at[:, dn, :].set(
            jnp.where(stamp_hit, 2 * t + 1, stamp_row)
        )

        # Join: merge the destination's old instance into the source's iff
        # the two share no node types (checked after the slot reassignment,
        # as the reference does).
        has_src = jnp.any(labels == sl[:, None, None], axis=2)  # (S, N)
        has_dst = jnp.any(labels == dl[:, None, None], axis=2)
        overlap = jnp.any(has_src & has_dst, axis=1)
        merge = join & ~overlap & (sl != dl)
        relabel = merge[:, None, None] & (labels == dl[:, None, None])
        labels = jnp.where(relabel, sl[:, None, None], labels)

        next_id = next_id + fresh.astype(jnp.int32)
        return (labels, stamps, next_id), None

    init = (
        jnp.full((S, N, K), -1, jnp.int32),
        jnp.zeros((S, N, K), jnp.int32),
        jnp.zeros((S,), jnp.int32),
    )
    (labels, stamps, _), _ = jax.lax.scan(step, init, xs, unroll=4)

    # ---- Rank surviving ids by creation order (ascending id == reference's
    # sorted(set(values)) remap) and bound the output at M instances.
    max_ids = T  # the counter increments at most once per step
    id_iota = jnp.arange(max_ids, dtype=jnp.int32)
    flat = labels.reshape(S, N * K)
    present = jnp.any(flat[:, :, None] == id_iota[None, None, :], axis=1)  # (S, I)
    if min_instance_peaks > 0:
        slot_counts = jnp.sum(
            (flat[:, :, None] == id_iota[None, None, :]), axis=1
        )
        present = present & (slot_counts >= min_instance_peaks)
    rank = jnp.cumsum(present.astype(jnp.int32), axis=1) - 1  # (S, I)
    rank = jnp.where(present, rank, max_ids)

    # Per-slot output row (M = padded-out sentinel). One-hot where-sum
    # instead of take_along_axis: these tiny-tensor gathers cost ~3 ms/iter
    # of fixed XLA gather overhead at batch 256 (profiled round 3), while
    # the equivalent compare+select+reduce fuses to ~nothing.
    rank_padded = jnp.pad(rank, ((0, 0), (0, 1)), constant_values=max_ids)
    slot_idx = jnp.where(flat >= 0, flat, max_ids)  # (S, N*K)
    idx_oh = slot_idx[:, :, None] == jnp.arange(max_ids + 1)[None, None, :]
    slot_rank = jnp.sum(
        jnp.where(idx_oh, rank_padded[:, None, :], 0), axis=2
    ).reshape(S, N, K)
    slot_rank = jnp.where(slot_rank < M, slot_rank, M)

    # Dict-insertion-order overwrite: per (sample, node, instance) the slot
    # with the LARGEST stamp wins.
    one_hot = slot_rank[..., None] == jnp.arange(M)[None, None, None, :]
    keyed = jnp.where(one_hot, stamps[..., None] + 1, 0)  # (S, N, K, M)
    winner_k = jnp.argmax(keyed, axis=2)  # (S, N, M)
    has_slot = jnp.any(one_hot, axis=2)  # (S, N, M)

    # One-hot where-sum gathers (NaN-safe: select, don't multiply — the
    # padded peak slots are NaN and 0 * NaN would poison the sum).
    wk_oh = winner_k[..., None] == col_iota[None, None, None, :]  # (S,N,M,K)
    gathered = jnp.sum(
        jnp.where(wk_oh[..., None], peaks[:, :, None, :, :], 0.0), axis=3
    )  # (S, N, M, 2)
    inst_pts = jnp.where(
        has_slot[..., None], gathered, jnp.nan
    ).transpose(0, 2, 1, 3)  # (S, M, N, 2)
    gathered_vals = jnp.sum(
        jnp.where(wk_oh, peak_vals[:, :, None, :], 0.0), axis=3
    )
    inst_vals = jnp.where(has_slot, gathered_vals, jnp.nan).transpose(0, 2, 1)

    # Instance scores: sum of matched-connection scores whose source slot
    # belongs to the instance, using FINAL assignments (reference :917-944).
    e_src = jnp.asarray([e[0] for e in edge_inds_tuple], jnp.int32)
    src_labels = jnp.take(labels, e_src, axis=1)  # (S, E, K)
    src_rank = jnp.take(slot_rank, e_src, axis=1)  # (S, E, K)
    conn_scores = jnp.where(
        valid_conn & (src_labels >= 0), match_scores, 0.0
    )  # (S, E, K)
    score_oh = src_rank[..., None] == jnp.arange(M)[None, None, None, :]
    inst_scores = jnp.sum(
        jnp.where(score_oh, conn_scores[..., None], 0.0), axis=(1, 2)
    )  # (S, M)

    inst_valid = jnp.any(has_slot, axis=1)  # (S, M)
    return {
        "instances": inst_pts,
        "instance_peak_vals": inst_vals,
        "instance_scores": inst_scores,
        "instance_valid": inst_valid,
    }


# --------------------------------------------------------------------------- #
# Host-side assembly
# --------------------------------------------------------------------------- #


def assign_connections_to_instances(
    connections: Dict[int, List[Tuple[int, int, float]]],
    edge_inds: Sequence[Tuple[int, int]],
    sorted_edge_inds: Sequence[int],
    min_instance_peaks: Union[int, float] = 0,
    n_nodes: Optional[int] = None,
) -> Dict[Tuple[int, int], int]:
    """Greedy union of connections into instances (reference :799-914).

    Args:
        connections: {edge_ind: [(src_peak, dst_peak, score), ...]}.

    Returns:
        {(node_ind, peak_ind): instance_id}.
    """
    instance_assignments: Dict[Tuple[int, int], int] = {}
    for e in sorted_edge_inds:
        src_node, dst_node = edge_inds[e]
        for src_peak, dst_peak, _score in connections.get(e, []):
            src_id = (src_node, src_peak)
            dst_id = (dst_node, dst_peak)
            src_instance = instance_assignments.get(src_id)
            dst_instance = instance_assignments.get(dst_id)
            if src_instance is None and dst_instance is None:
                new_instance = max(instance_assignments.values(), default=-1) + 1
                instance_assignments[src_id] = new_instance
                instance_assignments[dst_id] = new_instance
            elif src_instance is not None and dst_instance is None:
                instance_assignments[dst_id] = src_instance
            elif src_instance is not None and dst_instance is not None:
                # Merge if the two partial instances share no node types.
                instance_assignments[dst_id] = src_instance
                src_nodes = {
                    pid[0]
                    for pid, inst in instance_assignments.items()
                    if inst == src_instance
                }
                dst_nodes = {
                    pid[0]
                    for pid, inst in instance_assignments.items()
                    if inst == dst_instance
                }
                if not src_nodes & dst_nodes:
                    for pid, inst in list(instance_assignments.items()):
                        if inst == dst_instance:
                            instance_assignments[pid] = src_instance

    if min_instance_peaks > 0:
        if isinstance(min_instance_peaks, float):
            if n_nodes is None:
                n_nodes = len({n for e in edge_inds for n in e})
            min_instance_peaks = int(min_instance_peaks * n_nodes)
        ids, counts = np.unique(list(instance_assignments.values()), return_counts=True)
        keep = {i for i, c in zip(ids, counts) if c >= min_instance_peaks}
        instance_assignments = {
            pid: inst for pid, inst in instance_assignments.items() if inst in keep
        }
    return instance_assignments


def make_predicted_instances(
    peaks: np.ndarray,
    peak_vals: np.ndarray,
    connections: Dict[int, List[Tuple[int, int, float]]],
    instance_assignments: Dict[Tuple[int, int], int],
    edge_inds: Sequence[Tuple[int, int]],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fill (n_instances, n_nodes, 2) arrays from assignments (reference :917).

    Args:
        peaks: (n_nodes, K, 2); peak_vals: (n_nodes, K).
    """
    instance_ids = sorted(set(instance_assignments.values()))
    remap = {old: new for new, old in enumerate(instance_ids)}
    n_instances = len(instance_ids)
    n_nodes = peaks.shape[0]

    instance_scores = np.zeros(n_instances, "float32")
    for e, conns in connections.items():
        src_node, dst_node = edge_inds[e]
        for src_peak, dst_peak, score in conns:
            src_id = (src_node, src_peak)
            if src_id in instance_assignments:
                instance_scores[remap[instance_assignments[src_id]]] += score

    pred_instances = np.full((n_instances, n_nodes, 2), np.nan, "float32")
    pred_peak_scores = np.full((n_instances, n_nodes), np.nan, "float32")
    for (node_ind, peak_ind), inst in instance_assignments.items():
        i = remap[inst]
        pred_instances[i, node_ind] = peaks[node_ind, peak_ind]
        pred_peak_scores[i, node_ind] = peak_vals[node_ind, peak_ind]
    return pred_instances, pred_peak_scores, instance_scores


@attr.s(auto_attribs=True)
class PAFScorer:
    """Peak grouping via PAFs (reference :1319).

    API: :meth:`predict` consumes on-chip peaks + PAFs and returns grouped
    instances per sample (host lists, NaN-padded arrays).
    """

    part_names: List[str]
    edges: List[Tuple[str, str]]
    pafs_stride: int = 1
    max_edge_length_ratio: float = 0.25
    dist_penalty_weight: float = 1.0
    n_points: int = 10
    min_instance_peaks: Union[int, float] = 0
    min_line_scores: float = 0.25

    @property
    def edge_inds(self) -> List[Tuple[int, int]]:
        return [
            (self.part_names.index(s), self.part_names.index(d)) for s, d in self.edges
        ]

    @property
    def sorted_edge_inds(self) -> Tuple[int, ...]:
        return toposort_edges(self.edge_inds)

    @classmethod
    def from_config(
        cls,
        config,
        max_edge_length_ratio: float = 0.25,
        dist_penalty_weight: float = 1.0,
        n_points: int = 10,
        min_instance_peaks: Union[int, float] = 0,
        min_line_scores: float = 0.25,
    ) -> "PAFScorer":
        """Build from a ``MultiInstanceConfig`` (reference :1372)."""
        return cls(
            part_names=list(config.confmaps.part_names),
            edges=[tuple(e) for e in config.pafs.edges],
            pafs_stride=config.pafs.output_stride,
            max_edge_length_ratio=max_edge_length_ratio,
            dist_penalty_weight=dist_penalty_weight,
            n_points=n_points,
            min_instance_peaks=min_instance_peaks,
            min_line_scores=min_line_scores,
        )

    def score_and_match(self, pafs, peaks):
        """On-chip: line scoring + Hungarian matching."""
        scores = score_paf_lines_batch(
            pafs,
            peaks,
            jnp.asarray(self.edge_inds, jnp.int32),
            n_line_points=self.n_points,
            pafs_stride=self.pafs_stride,
            max_edge_length_ratio=self.max_edge_length_ratio,
            dist_penalty_weight=self.dist_penalty_weight,
        )
        return match_candidates_batch(scores)

    def resolved_min_instance_peaks(self) -> int:
        """Fractional ``min_instance_peaks`` resolved against n_nodes."""
        if isinstance(self.min_instance_peaks, float):
            return int(self.min_instance_peaks * len(self.part_names))
        return int(self.min_instance_peaks)

    def group_batch(
        self,
        peaks: jnp.ndarray,
        peak_vals: jnp.ndarray,
        dst_for_src: jnp.ndarray,
        match_scores: jnp.ndarray,
        max_instances: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """On-chip greedy assembly for a whole batch (jittable; equivalent to
        per-sample :meth:`group_sample` up to NaN padding)."""
        return group_instances_batch(
            peaks,
            peak_vals,
            dst_for_src,
            match_scores,
            edge_inds_tuple=tuple((int(s), int(d)) for s, d in self.edge_inds),
            sorted_edge_inds=tuple(self.sorted_edge_inds),
            min_line_scores=float(self.min_line_scores),
            min_instance_peaks=self.resolved_min_instance_peaks(),
            max_instances=max_instances,
        )

    def group_sample(
        self,
        peaks: np.ndarray,
        peak_vals: np.ndarray,
        dst_for_src: np.ndarray,
        match_scores: np.ndarray,
        match_valid: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host: matched connections -> grouped instances for one sample."""
        connections: Dict[int, List[Tuple[int, int, float]]] = {}
        E, K = dst_for_src.shape
        for e in range(E):
            conns = []
            for src_peak in range(K):
                if not match_valid[e, src_peak]:
                    continue
                score = float(match_scores[e, src_peak])
                if score < self.min_line_scores:
                    continue
                conns.append((src_peak, int(dst_for_src[e, src_peak]), score))
            # Reference ordering: connections within an edge are processed in
            # source-peak order (matching tf_linear_sum_assignment output).
            connections[e] = conns
        assignments = assign_connections_to_instances(
            connections,
            self.edge_inds,
            self.sorted_edge_inds,
            min_instance_peaks=self.min_instance_peaks,
            n_nodes=len(self.part_names),
        )
        return make_predicted_instances(
            peaks, peak_vals, connections, assignments, self.edge_inds
        )

    def predict(
        self, pafs, peaks, peak_vals, peak_mask
    ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Full pipeline for a batch.

        Args:
            pafs: (S, H', W', 2*n_edges) jnp array.
            peaks: (S, n_nodes, K, 2) jnp array (NaN-padded).
            peak_vals / peak_mask: (S, n_nodes, K).

        Returns:
            Per-sample tuples (instances (n_i, n_nodes, 2), peak_scores,
            instance_scores).
        """
        dst_for_src, match_scores, match_valid = self.score_and_match(pafs, peaks)
        peaks = np.asarray(peaks)
        peak_vals = np.asarray(peak_vals)
        dst_for_src = np.asarray(dst_for_src)
        match_scores = np.asarray(match_scores)
        match_valid = np.asarray(match_valid)
        return [
            self.group_sample(
                peaks[s], peak_vals[s], dst_for_src[s], match_scores[s], match_valid[s]
            )
            for s in range(peaks.shape[0])
        ]
