"""Direct unit tests of the PAF grouping algorithm.

Mirrors the behaviors covered by the reference's
``tests/nn/test_paf_grouping.py`` (403 LoC) against this rebuild's
static-shape API: line scoring with hand-built PAFs, distance penalty,
Hungarian matching, greedy instance assembly, and the PAFScorer end-to-end
pipeline on a synthetic two-instance frame.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sleap_tpu.ops.paf_grouping import (
    PAFScorer,
    assign_connections_to_instances,
    make_predicted_instances,
    match_candidates_batch,
    score_paf_lines_batch,
    toposort_edges,
)


def test_toposort_edges_sources_precede():
    # Skeleton 0->1, 1->2, 1->3 given in scrambled order.
    edges = [(1, 3), (0, 1), (1, 2)]
    order = toposort_edges(edges)
    # Edge (0,1) (index 1 in the list) must come before both children.
    assert order[0] == 1
    assert set(order) == {0, 1, 2}


def _paf_with_edge(H, W, n_edges, edge, src, dst):
    """PAF map whose channels for `edge` hold the unit vector src->dst along
    the whole map (so any line between them integrates to exactly 1)."""
    pafs = np.zeros((H, W, 2 * n_edges), np.float32)
    d = np.asarray(dst, np.float32) - np.asarray(src, np.float32)
    u = d / np.linalg.norm(d)
    pafs[:, :, 2 * edge] = u[0]
    pafs[:, :, 2 * edge + 1] = u[1]
    return pafs


def test_score_paf_lines_perfect_alignment():
    H = W = 32
    src, dst = (4.0, 4.0), (20.0, 12.0)
    pafs = jnp.asarray(_paf_with_edge(H, W, 1, 0, src, dst))[None]
    peaks = jnp.full((1, 2, 1, 2), jnp.nan)
    peaks = peaks.at[0, 0, 0].set(src).at[0, 1, 0].set(dst)
    scores = score_paf_lines_batch(
        pafs,
        peaks,
        jnp.asarray([[0, 1]], jnp.int32),
        n_line_points=10,
        pafs_stride=1,
        max_edge_length_ratio=1.0,
        dist_penalty_weight=1.0,
    )
    # Unit field dotted with the unit displacement = 1 at every sample.
    np.testing.assert_allclose(np.asarray(scores)[0, 0, 0, 0], 1.0, atol=1e-5)


def test_score_paf_lines_perpendicular_field_scores_zero():
    H = W = 32
    pafs = np.zeros((H, W, 2), np.float32)
    pafs[:, :, 1] = 1.0  # field points +y; displacement is +x
    peaks = jnp.full((1, 2, 1, 2), jnp.nan)
    peaks = peaks.at[0, 0, 0].set((4.0, 16.0)).at[0, 1, 0].set((28.0, 16.0))
    scores = score_paf_lines_batch(
        jnp.asarray(pafs)[None],
        peaks,
        jnp.asarray([[0, 1]], jnp.int32),
        max_edge_length_ratio=1.0,
    )
    np.testing.assert_allclose(np.asarray(scores)[0, 0, 0, 0], 0.0, atol=1e-6)


def test_score_paf_lines_distance_penalty():
    """Edges longer than max_edge_length_ratio * max(H,W) * stride are
    penalized by min(max_len/dist - 1, 0) * weight (reference :278-325)."""
    H = W = 32
    src, dst = (0.0, 16.0), (30.0, 16.0)  # length 30
    pafs = jnp.asarray(_paf_with_edge(H, W, 1, 0, src, dst))[None]
    peaks = jnp.full((1, 2, 1, 2), jnp.nan)
    peaks = peaks.at[0, 0, 0].set(src).at[0, 1, 0].set(dst)

    def score(ratio, weight=1.0):
        s = score_paf_lines_batch(
            pafs,
            peaks,
            jnp.asarray([[0, 1]], jnp.int32),
            max_edge_length_ratio=ratio,
            dist_penalty_weight=weight,
        )
        return float(np.asarray(s)[0, 0, 0, 0])

    assert score(1.0) == pytest.approx(1.0, abs=1e-5)  # under the cap
    # Cap = 0.25 * 32 = 8; penalty = (8/30 - 1) = -0.7333...
    assert score(0.25) == pytest.approx(1.0 + (8.0 / 30.0 - 1.0), abs=1e-4)
    # Weight scales the penalty.
    assert score(0.25, weight=2.0) == pytest.approx(
        1.0 + 2.0 * (8.0 / 30.0 - 1.0), abs=1e-4
    )


def test_score_paf_lines_nan_for_missing_peaks():
    pafs = jnp.zeros((1, 16, 16, 2))
    peaks = jnp.full((1, 2, 2, 2), jnp.nan)
    peaks = peaks.at[0, 0, 0].set((2.0, 2.0))  # dst entirely missing
    scores = score_paf_lines_batch(pafs, peaks, jnp.asarray([[0, 1]], jnp.int32))
    assert np.isnan(np.asarray(scores)).all()


def test_match_candidates_batch_picks_best_assignment():
    # 2x2 score matrix where the off-diagonal assignment wins in total.
    scores = jnp.asarray([[[[0.9, 0.8], [0.85, 0.1]]]])  # (1, 1, 2, 2)
    dst_for_src, match_scores, match_valid = match_candidates_batch(scores)
    dst = np.asarray(dst_for_src)[0, 0]
    # Hungarian on -scores: total 0.8 + 0.85 = 1.65 beats 0.9 + 0.1 = 1.0.
    assert dst.tolist() == [1, 0]
    np.testing.assert_allclose(np.asarray(match_scores)[0, 0], [0.8, 0.85])
    assert np.asarray(match_valid)[0, 0].all()


def test_match_candidates_batch_nan_rows_invalid():
    scores = jnp.asarray([[[[0.9, np.nan], [np.nan, np.nan]]]])
    dst_for_src, match_scores, match_valid = match_candidates_batch(scores)
    valid = np.asarray(match_valid)[0, 0]
    assert valid[0] and not valid[1]
    assert np.asarray(dst_for_src)[0, 0, 0] == 0


def test_assign_connections_chains_into_one_instance():
    # 0->1->2 chain: both connections end up in one instance.
    edge_inds = [(0, 1), (1, 2)]
    connections = {0: [(0, 0, 1.0)], 1: [(0, 0, 1.0)]}
    assignments = assign_connections_to_instances(
        connections, edge_inds, toposort_edges(edge_inds)
    )
    assert len(set(assignments.values())) == 1
    assert set(assignments) == {(0, 0), (1, 0), (2, 0)}


def test_assign_connections_two_instances():
    edge_inds = [(0, 1)]
    connections = {0: [(0, 0, 1.0), (1, 1, 0.9)]}
    assignments = assign_connections_to_instances(connections, edge_inds, (0,))
    assert len(set(assignments.values())) == 2
    assert assignments[(0, 0)] == assignments[(1, 0)]
    assert assignments[(0, 1)] == assignments[(1, 1)]


def test_assign_connections_min_instance_peaks():
    edge_inds = [(0, 1), (1, 2)]
    # Instance A spans 3 peaks, instance B only 2.
    connections = {0: [(0, 0, 1.0), (1, 1, 1.0)], 1: [(0, 0, 1.0)]}
    full = assign_connections_to_instances(
        connections, edge_inds, toposort_edges(edge_inds)
    )
    assert len(set(full.values())) == 2
    filtered = assign_connections_to_instances(
        connections, edge_inds, toposort_edges(edge_inds), min_instance_peaks=3
    )
    assert len(set(filtered.values())) == 1
    # Float fraction: 0.9 * 3 nodes -> ceil-free int() = 2, keeps both.
    frac = assign_connections_to_instances(
        connections,
        edge_inds,
        toposort_edges(edge_inds),
        min_instance_peaks=0.67,
        n_nodes=3,
    )
    assert len(set(frac.values())) == 2


def test_make_predicted_instances_fills_points_and_scores():
    peaks = np.array(
        [[[1.0, 2.0], [10.0, 20.0]], [[3.0, 4.0], [30.0, 40.0]]], np.float32
    )  # (2 nodes, K=2, 2)
    peak_vals = np.array([[0.9, 0.8], [0.7, 0.6]], np.float32)
    edge_inds = [(0, 1)]
    connections = {0: [(0, 0, 0.5), (1, 1, 0.25)]}
    assignments = assign_connections_to_instances(connections, edge_inds, (0,))
    inst, scores, inst_scores = make_predicted_instances(
        peaks, peak_vals, connections, assignments, edge_inds
    )
    assert inst.shape == (2, 2, 2)
    a = assignments[(0, 0)]
    np.testing.assert_allclose(inst[a, 0], [1.0, 2.0])
    np.testing.assert_allclose(inst[a, 1], [3.0, 4.0])
    np.testing.assert_allclose(scores[a], [0.9, 0.7])
    np.testing.assert_allclose(sorted(inst_scores.tolist()), [0.25, 0.5])


def test_paf_scorer_end_to_end_two_instances():
    """Synthetic frame: two 3-node instances with disjoint PAF fields."""
    H = W = 64
    part_names = ["head", "thorax", "tail"]
    edges = [("head", "thorax"), ("thorax", "tail")]
    inst_a = np.array([[10.0, 10.0], [20.0, 10.0], [30.0, 10.0]])
    inst_b = np.array([[10.0, 50.0], [20.0, 50.0], [30.0, 50.0]])

    pafs = np.zeros((H, W, 4), np.float32)
    for pts in (inst_a, inst_b):
        for e, (s, d) in enumerate([(0, 1), (1, 2)]):
            src, dst = pts[s], pts[d]
            u = (dst - src) / np.linalg.norm(dst - src)
            y = int(src[1])
            pafs[y - 2 : y + 3, :, 2 * e] = u[0]
            pafs[y - 2 : y + 3, :, 2 * e + 1] = u[1]

    K = 4
    peaks = np.full((1, 3, K, 2), np.nan, np.float32)
    peak_vals = np.zeros((1, 3, K), np.float32)
    for n in range(3):
        peaks[0, n, 0] = inst_a[n]
        peaks[0, n, 1] = inst_b[n]
        peak_vals[0, n, :2] = 1.0

    scorer = PAFScorer(
        part_names=part_names,
        edges=edges,
        pafs_stride=1,
        max_edge_length_ratio=1.0,
        min_line_scores=0.25,
    )
    results = scorer.predict(
        jnp.asarray(pafs)[None],
        jnp.asarray(peaks),
        jnp.asarray(peak_vals),
        jnp.asarray(~np.isnan(peaks[..., 0])),
    )
    assert len(results) == 1
    inst, pk_scores, inst_scores = results[0]
    assert inst.shape[0] == 2
    recovered = {tuple(np.round(i.ravel()).astype(int)) for i in inst}
    expected = {
        tuple(np.round(inst_a.ravel()).astype(int)),
        tuple(np.round(inst_b.ravel()).astype(int)),
    }
    assert recovered == expected
    # Each instance sums two near-perfect line scores.
    assert (inst_scores > 1.5).all()


def _random_match_inputs(rng, S=6, N=5, K=8, E=4):
    """Synthesize random matched-connection tensors with NaN padding."""
    edge_inds = [(0, 1), (1, 2), (1, 3), (3, 4)]
    peaks = rng.uniform(0, 100, size=(S, N, K, 2)).astype(np.float32)
    n_real = rng.integers(1, K + 1, size=(S, N))
    for s in range(S):
        for n in range(N):
            peaks[s, n, n_real[s, n]:] = np.nan
    peak_vals = rng.uniform(0.2, 1.0, size=(S, N, K)).astype(np.float32)
    dst_for_src = np.stack(
        [np.stack([rng.permutation(K) for _ in range(E)]) for _ in range(S)]
    ).astype(np.int32)
    match_scores = rng.uniform(-0.5, 1.0, size=(S, E, K)).astype(np.float32)
    # Pad: missing src/dst peaks make the match invalid (NaN), as produced by
    # match_candidates_batch when scores are NaN.
    for s in range(S):
        for e, (sn, dn) in enumerate(edge_inds):
            for k in range(K):
                if k >= n_real[s, sn] or dst_for_src[s, e, k] >= n_real[s, dn]:
                    match_scores[s, e, k] = np.nan
    return edge_inds, peaks, peak_vals, dst_for_src, match_scores


def test_onchip_grouping_matches_host():
    """group_instances_batch == per-sample host group_sample on random
    NaN-padded matches (reference assembly semantics :799-944)."""
    rng = np.random.default_rng(3)
    edge_inds, peaks, peak_vals, dst_for_src, match_scores = _random_match_inputs(rng)
    scorer = PAFScorer(
        part_names=["a", "b", "c", "d", "e"],
        edges=[("a", "b"), ("b", "c"), ("b", "d"), ("d", "e")],
        min_line_scores=0.25,
    )
    out = scorer.group_batch(
        jnp.asarray(peaks),
        jnp.asarray(peak_vals),
        jnp.asarray(dst_for_src),
        jnp.asarray(match_scores),
    )
    inst = np.asarray(out["instances"])
    vals = np.asarray(out["instance_peak_vals"])
    scores = np.asarray(out["instance_scores"])
    valid = np.asarray(out["instance_valid"])
    for s in range(peaks.shape[0]):
        h_inst, h_vals, h_scores = scorer.group_sample(
            peaks[s], peak_vals[s], dst_for_src[s], match_scores[s],
            ~np.isnan(match_scores[s]),
        )
        n_i = h_inst.shape[0]
        assert valid[s, :n_i].all() and not valid[s, n_i:].any(), s
        np.testing.assert_allclose(inst[s, :n_i], h_inst, equal_nan=True, atol=1e-5)
        np.testing.assert_allclose(vals[s, :n_i], h_vals, equal_nan=True, atol=1e-5)
        np.testing.assert_allclose(scores[s, :n_i], h_scores, atol=1e-4)


def test_onchip_grouping_min_instance_peaks():
    rng = np.random.default_rng(11)
    edge_inds, peaks, peak_vals, dst_for_src, match_scores = _random_match_inputs(rng)
    scorer = PAFScorer(
        part_names=["a", "b", "c", "d", "e"],
        edges=[("a", "b"), ("b", "c"), ("b", "d"), ("d", "e")],
        min_line_scores=0.25,
        min_instance_peaks=3,
    )
    out = scorer.group_batch(
        jnp.asarray(peaks), jnp.asarray(peak_vals),
        jnp.asarray(dst_for_src), jnp.asarray(match_scores),
    )
    valid = np.asarray(out["instance_valid"])
    inst = np.asarray(out["instances"])
    for s in range(peaks.shape[0]):
        h_inst, _, _ = scorer.group_sample(
            peaks[s], peak_vals[s], dst_for_src[s], match_scores[s],
            ~np.isnan(match_scores[s]),
        )
        n_i = h_inst.shape[0]
        assert valid[s].sum() == n_i
        np.testing.assert_allclose(inst[s, :n_i], h_inst, equal_nan=True, atol=1e-5)
