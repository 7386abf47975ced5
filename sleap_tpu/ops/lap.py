"""Batched linear assignment on-chip (JAX).

Replaces the reference's ``tf_linear_sum_assignment`` scipy round-trip
(``/root/reference/sleap/nn/utils.py:80``), which is a py_function graph break
on the hot bottom-up path (paf_grouping.py:639) — a major reference
bottleneck per SURVEY §2.11. Cost matrices in this domain are tiny (peaks x
peaks, <= ~32^2), so we run the exact shortest-augmenting-path algorithm
(same family as scipy's LAPJV implementation) with static bounds and masked
arithmetic, fully jittable and vmap-able over (batch, edge) axes.

Padding contract: callers pad costs to a static (n, n) with ``PAD_COST`` for
invalid entries; assignments touching a padded entry are filtered by cost
threshold afterwards.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Forbidden-entry cost. Deliberately small enough that float32 dual updates
# (which reach PAD magnitude when padded entries get assigned) keep enough
# precision to order the *real* costs: eps(1e3) ~ 6e-5. Real costs in this
# framework are similarity/line scores in roughly [-10, 10].
PAD_COST = 1e3
_INF = jnp.inf


# Largest n solved by the subset-DP path (2^n states per matrix). Above
# this, state memory grows past the win and the JV path takes over.
_MAX_DP_N = 12


def _solve_lap_dp(cost: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact assignment via DP over column subsets (Held-Karp).

    For the tiny matrices on the hot paths (peaks x peaks <= 8x8, 384 of
    them per bottom-up batch) the shortest-augmenting-path solver's nested
    data-dependent ``while`` loops cost ~8 ms/batch of pure sequential
    latency on TPU (profiled). This formulation needs only ``n`` scan steps
    of a fully vectorized (2^n, n) gather+min plus an ``n``-step backtrack
    — ~16 sequential steps instead of ~130 — and is exact (same family of
    optima; tie-breaks may differ from scipy, which no caller depends on).
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)
    # Row+column reduction: subtracting per-row/col constants changes every
    # perfect matching's total equally, so the argmin assignment is
    # unchanged — but dp magnitudes shrink from O(n * PAD_COST) to O(range),
    # preserving f32 resolution for the real costs.
    cost = cost - jnp.min(cost, axis=1, keepdims=True)
    cost = cost - jnp.min(cost, axis=0, keepdims=True)

    n_sub = 1 << n
    subsets = jnp.arange(n_sub, dtype=jnp.int32)
    cols = jnp.arange(n, dtype=jnp.int32)
    has_bit = ((subsets[:, None] >> cols[None, :]) & 1) == 1  # (2^n, n)
    prev_idx = subsets[:, None] ^ (1 << cols)[None, :]  # S \ {j} where set

    def step(dp, cost_row):
        cand = dp[prev_idx] + cost_row[None, :]
        cand = jnp.where(has_bit, cand, _INF)
        arg = jnp.argmin(cand, axis=1)
        dp_new = jnp.min(cand, axis=1)
        return dp_new, arg.astype(jnp.int8)

    dp0 = jnp.where(subsets == 0, 0.0, _INF).astype(jnp.float32)
    _, args = lax.scan(step, dp0, cost)  # args: (n, 2^n)

    def back_step(S, i):
        j = args[i, S].astype(jnp.int32)
        return S - (1 << j), j

    _, cols_rev = lax.scan(
        back_step, jnp.int32(n_sub - 1), jnp.arange(n - 1, -1, -1)
    )
    col4row = cols_rev[::-1]
    row4col = (
        jnp.zeros(n, jnp.int32).at[col4row].set(jnp.arange(n, dtype=jnp.int32))
    )
    return col4row, row4col


@functools.partial(jax.jit, static_argnames=())
def solve_lap(cost: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact minimum-cost square assignment.

    Args:
        cost: (n, n) float matrix; use large finite values (``PAD_COST``)
            instead of inf/NaN for forbidden entries.

    Returns:
        (col4row, row4col): int32 arrays of shape (n,) with the assignment
        (col4row[i] = column assigned to row i).
    """
    n = cost.shape[0]
    if n <= _MAX_DP_N:
        return _solve_lap_dp(cost)
    cost = cost.astype(jnp.float32)

    def augment_row(carry, cur_row):
        u, v, row4col, col4row = carry

        def dijkstra_cond(state):
            (_i, _minval, _sr, _sc, _spc, _path, sink) = state
            return sink < 0

        def dijkstra_body(state):
            (i, minval, sr, sc, spc, path, sink) = state
            sr = sr.at[i].set(True)
            r = minval + cost[i, :] - u[i] - v
            better = (r < spc) & (~sc)
            spc = jnp.where(better, r, spc)
            path = jnp.where(better, i, path)
            # Column pick: min shortest-path cost among unscanned; ties prefer
            # unassigned columns (scipy tie-break).
            masked = jnp.where(sc, _INF, spc)
            assigned = row4col >= 0
            key = masked + jnp.where(assigned, 1e-30, 0.0)
            lowest = jnp.min(masked)
            cand = (masked <= lowest) & (~sc)
            unassigned_cand = cand & (~assigned)
            j = jnp.where(
                jnp.any(unassigned_cand),
                jnp.argmax(unassigned_cand),
                jnp.argmax(cand),
            )
            minval = masked[j]
            sc = sc.at[j].set(True)
            is_free = row4col[j] < 0
            sink = jnp.where(is_free, j, sink)
            i = jnp.where(is_free, i, row4col[j])
            return (i, minval, sr, sc, spc, path, sink)

        init = (
            cur_row,
            jnp.float32(0.0),
            jnp.zeros(n, bool),
            jnp.zeros(n, bool),
            jnp.full(n, _INF, jnp.float32),
            jnp.full(n, -1, jnp.int32),
            jnp.int32(-1),
        )
        (_, minval, sr, sc, spc, path, sink) = lax.while_loop(
            dijkstra_cond, dijkstra_body, init
        )

        # Dual updates (scipy _lsap semantics).
        u = u.at[cur_row].add(minval)
        other = sr & (jnp.arange(n) != cur_row)
        spc_at_col4row = spc[jnp.clip(col4row, 0, n - 1)]
        u = jnp.where(other, u + minval - spc_at_col4row, u)
        v = jnp.where(sc, v - (minval - spc), v)

        # Augment along the alternating path ending at sink.
        def aug_cond(state):
            (_j, _r4c, _c4r, done) = state
            return ~done

        def aug_body(state):
            (j, r4c, c4r, done) = state
            i = path[j]
            r4c = r4c.at[j].set(i)
            next_j = c4r[i]
            c4r = c4r.at[i].set(j)
            return (next_j, r4c, c4r, i == cur_row)

        (_, row4col, col4row, _) = lax.while_loop(
            aug_cond, aug_body, (sink, row4col, col4row, jnp.bool_(False))
        )
        return (u, v, row4col, col4row), None

    init = (
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.full(n, -1, jnp.int32),
        jnp.full(n, -1, jnp.int32),
    )
    (u, v, row4col, col4row), _ = lax.scan(
        augment_row, init, jnp.arange(n, dtype=jnp.int32)
    )
    return col4row, row4col


def prepare_cost(
    cost: jnp.ndarray,
    row_mask: jnp.ndarray = None,
    col_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """NaN/masked entries -> PAD_COST (the reference maps NaN->inf before
    scipy, paf_grouping.py:630-639; we use a large finite value)."""
    cost = jnp.where(jnp.isnan(cost), PAD_COST, cost)
    if row_mask is not None:
        cost = jnp.where(row_mask[:, None], cost, PAD_COST)
    if col_mask is not None:
        cost = jnp.where(col_mask[None, :], cost, PAD_COST)
    return cost


batched_solve_lap = jax.vmap(solve_lap)


def assignment_is_valid(
    cost: jnp.ndarray, col4row: jnp.ndarray, threshold: float = PAD_COST / 2
) -> jnp.ndarray:
    """(n,) bool: row's assignment used a real (non-padded) cost entry."""
    n = cost.shape[0]
    picked = cost[jnp.arange(n), jnp.clip(col4row, 0, n - 1)]
    return (col4row >= 0) & (picked < threshold)
