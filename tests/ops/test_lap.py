import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from sleap_tpu.ops.lap import (
    PAD_COST,
    assignment_is_valid,
    batched_solve_lap,
    prepare_cost,
    solve_lap,
)


def total_cost(cost, col4row):
    return cost[np.arange(len(col4row)), col4row].sum()


@pytest.mark.parametrize("n", [2, 3, 5, 8, 16])
def test_solve_lap_matches_scipy_cost(n):
    rng = np.random.default_rng(n)
    for trial in range(5):
        cost = rng.uniform(0, 10, size=(n, n)).astype("f4")
        col4row, row4col = solve_lap(jnp.asarray(cost))
        col4row = np.asarray(col4row)
        # Valid permutation.
        assert sorted(col4row.tolist()) == list(range(n))
        ref_rows, ref_cols = linear_sum_assignment(cost)
        ref = cost[ref_rows, ref_cols].sum()
        ours = total_cost(cost, col4row)
        assert ours == pytest.approx(ref, abs=1e-4)


def test_solve_lap_negative_costs():
    rng = np.random.default_rng(0)
    cost = rng.normal(size=(6, 6)).astype("f4")
    col4row, _ = solve_lap(jnp.asarray(cost))
    ref_rows, ref_cols = linear_sum_assignment(cost)
    assert total_cost(cost, np.asarray(col4row)) == pytest.approx(
        cost[ref_rows, ref_cols].sum(), abs=1e-4
    )


def test_rectangular_via_padding():
    """3 rows x 5 cols padded to 5x5: valid rows keep optimal columns."""
    rng = np.random.default_rng(2)
    sub = rng.uniform(0, 5, size=(3, 5)).astype("f4")
    cost = np.full((5, 5), PAD_COST, "f4")
    cost[:3, :] = sub
    col4row, _ = solve_lap(jnp.asarray(cost))
    col4row = np.asarray(col4row)
    valid = np.asarray(
        assignment_is_valid(jnp.asarray(cost), jnp.asarray(col4row))
    )
    assert valid[:3].all() and not valid[3:].any()
    ref_rows, ref_cols = linear_sum_assignment(sub)
    assert sub[np.arange(3), col4row[:3]].sum() == pytest.approx(
        sub[ref_rows, ref_cols].sum(), abs=1e-4
    )


def test_prepare_cost_nan_and_masks():
    cost = jnp.array([[1.0, np.nan], [np.nan, 2.0]])
    out = prepare_cost(cost, row_mask=jnp.array([True, False]))
    assert float(out[0, 1]) == PAD_COST
    assert float(out[1, 0]) == PAD_COST
    assert float(out[1, 1]) == PAD_COST  # masked row
    assert float(out[0, 0]) == 1.0


def test_batched():
    rng = np.random.default_rng(3)
    costs = rng.uniform(0, 1, size=(10, 6, 6)).astype("f4")
    col4rows, _ = batched_solve_lap(jnp.asarray(costs))
    for cost, c4r in zip(costs, np.asarray(col4rows)):
        ref_rows, ref_cols = linear_sum_assignment(cost)
        assert total_cost(cost, c4r) == pytest.approx(
            cost[ref_rows, ref_cols].sum(), abs=1e-4
        )
