import numpy as np
import pytest

import jax.numpy as jnp

from sleap_tpu.ops.grid import make_grid_vectors, gaussian_pdf
from sleap_tpu.ops.confmaps import (
    make_confmaps,
    make_multi_confmaps,
    make_multi_confmaps_with_offsets,
)
from sleap_tpu.ops.edge_maps import (
    distance_to_edge,
    make_edge_maps,
    make_pafs,
    make_multi_pafs,
    get_edge_points,
)
from sleap_tpu.ops.offsets import make_offsets, mask_offsets


def test_make_grid_vectors():
    xv, yv = make_grid_vectors(8, 6, output_stride=2)
    np.testing.assert_array_equal(xv, [0, 2, 4])
    np.testing.assert_array_equal(yv, [0, 2, 4, 6])
    assert xv.dtype == jnp.float32


def test_make_confmaps_peak_value_and_location():
    xv, yv = make_grid_vectors(16, 16, 1)
    pts = jnp.array([[4.0, 5.0], [10.0, 12.0]])
    cm = make_confmaps(pts, xv, yv, sigma=1.5)
    assert cm.shape == (16, 16, 2)
    # Grid-aligned point gives exactly 1.0 at its location.
    assert cm[5, 4, 0] == pytest.approx(1.0)
    assert cm[12, 10, 1] == pytest.approx(1.0)
    # Symmetric decay.
    assert cm[5, 3, 0] == pytest.approx(float(np.exp(-1 / (2 * 1.5**2))), rel=1e-5)
    assert cm[5, 3, 0] == pytest.approx(float(cm[5, 5, 0]), rel=1e-5)


def test_make_confmaps_nan_channel_zero():
    xv, yv = make_grid_vectors(8, 8, 1)
    pts = jnp.array([[np.nan, np.nan], [3.0, 3.0]])
    cm = make_confmaps(pts, xv, yv, sigma=1.0)
    assert float(jnp.sum(cm[..., 0])) == 0.0
    assert float(jnp.max(cm[..., 1])) == pytest.approx(1.0)


def test_make_multi_confmaps_max_reduction():
    xv, yv = make_grid_vectors(16, 16, 1)
    instances = jnp.array(
        [[[4.0, 4.0], [8.0, 8.0]], [[4.0, 6.0], [np.nan, np.nan]]]
    )
    cm = make_multi_confmaps(instances, xv, yv, sigma=1.0)
    assert cm.shape == (16, 16, 2)
    assert cm[4, 4, 0] == pytest.approx(1.0)
    assert cm[6, 4, 0] == pytest.approx(1.0)  # both peaks survive the max
    assert cm[8, 8, 1] == pytest.approx(1.0)


def test_make_multi_confmaps_excludes_out_of_image():
    xv, yv = make_grid_vectors(16, 16, 1)
    # Instance entirely outside the grid: no contribution at all.
    instances = jnp.array([[[40.0, 40.0], [50.0, 50.0]]])
    cm = make_multi_confmaps(instances, xv, yv, sigma=3.0)
    assert float(jnp.sum(cm)) == 0.0


def test_offsets_point_toward_target():
    xv, yv = make_grid_vectors(8, 8, 1)
    pts = jnp.array([[3.5, 2.5]])
    off = make_offsets(pts, xv, yv, stride=1)
    assert off.shape == (8, 8, 1, 2)
    np.testing.assert_allclose(off[2, 3, 0], [0.5, 0.5])
    np.testing.assert_allclose(off[0, 0, 0], [3.5, 2.5])
    # NaN points produce zeros.
    off_nan = make_offsets(jnp.array([[np.nan, np.nan]]), xv, yv)
    assert float(jnp.sum(jnp.abs(off_nan))) == 0.0


def test_mask_offsets():
    xv, yv = make_grid_vectors(8, 8, 1)
    pts = jnp.array([[4.0, 4.0]])
    cm = make_confmaps(pts, xv, yv, sigma=1.0)
    off = make_offsets(pts, xv, yv)
    masked = mask_offsets(off, cm, threshold=0.2)
    # Far corner: confidence ~0 -> masked to 0.
    assert float(jnp.sum(jnp.abs(masked[0, 0]))) == 0.0
    # At peak: offset is 0 anyway but neighbors nonzero.
    assert float(jnp.abs(masked[4, 3, 0, 0])) > 0


def test_multi_confmaps_with_offsets():
    xv, yv = make_grid_vectors(16, 16, 2)
    instances = jnp.array([[[5.0, 5.0], [11.0, 9.0]]])
    cms, offs = make_multi_confmaps_with_offsets(
        instances, xv, yv, stride=2, sigma=2.0
    )
    assert cms.shape == (8, 8, 2)
    assert offs.shape == (8, 8, 2, 2)
    # Peak at nearest grid point: point (5,5) is sqrt(2) off the stride-2
    # grid -> exp(-2 / (2*sigma^2)) = exp(-0.25).
    assert float(jnp.max(cms)) == pytest.approx(float(np.exp(-0.25)), rel=1e-5)


def test_distance_to_edge_squared():
    pts = jnp.array([[0.0, 1.0], [2.0, 0.0]])
    src = jnp.array([[0.0, 0.0]])
    dst = jnp.array([[2.0, 0.0]])
    d = distance_to_edge(pts, src, dst)
    # (0,1) is distance 1 from segment -> squared = 1.
    assert d[0, 0] == pytest.approx(1.0)
    # endpoint on the segment.
    assert d[1, 0] == pytest.approx(0.0)


def test_make_edge_maps_matches_reference_quirk():
    """The reference squares the (already squared) distance inside the
    Gaussian: value = exp(-d^4 / (2 sigma^2))."""
    xv, yv = make_grid_vectors(5, 5, 1)
    src = jnp.array([[0.0, 2.0]])
    dst = jnp.array([[4.0, 2.0]])
    em = make_edge_maps(xv, yv, src, dst, sigma=1.0)
    assert em.shape == (5, 5, 1)
    assert em[2, 2, 0] == pytest.approx(1.0)  # on the segment
    d2 = 1.0  # one pixel off the line -> squared distance 1
    assert em[3, 2, 0] == pytest.approx(float(np.exp(-(d2**2) / 2.0)), rel=1e-5)
    d2 = 4.0  # two pixels off -> squared distance 4
    assert em[0, 2, 0] == pytest.approx(float(np.exp(-(d2**2) / 2.0)), rel=1e-4)


def test_make_pafs_unit_vectors():
    xv, yv = make_grid_vectors(9, 9, 1)
    src = jnp.array([[1.0, 4.0]])
    dst = jnp.array([[7.0, 4.0]])  # horizontal edge
    pafs = make_pafs(xv, yv, src, dst, sigma=1.0)
    assert pafs.shape == (9, 9, 1, 2)
    np.testing.assert_allclose(pafs[4, 4, 0], [1.0, 0.0], atol=1e-6)
    # y-component zero everywhere for a horizontal edge.
    assert float(jnp.max(jnp.abs(pafs[..., 1]))) == pytest.approx(0.0)


def test_make_multi_pafs_sums_and_zeros_nan():
    xv, yv = make_grid_vectors(9, 9, 1)
    srcs = jnp.array([[[1.0, 4.0]], [[np.nan, np.nan]]])
    dsts = jnp.array([[[7.0, 4.0]], [[np.nan, np.nan]]])
    pafs = make_multi_pafs(xv, yv, srcs, dsts, sigma=1.0)
    assert pafs.shape == (9, 9, 1, 2)
    assert bool(jnp.all(jnp.isfinite(pafs)))
    assert pafs[4, 4, 0, 0] == pytest.approx(1.0)

    # Two overlapping identical edges sum to 2.
    srcs2 = jnp.array([[[1.0, 4.0]], [[1.0, 4.0]]])
    dsts2 = jnp.array([[[7.0, 4.0]], [[7.0, 4.0]]])
    pafs2 = make_multi_pafs(xv, yv, srcs2, dsts2, sigma=1.0)
    assert pafs2[4, 4, 0, 0] == pytest.approx(2.0)


def test_get_edge_points():
    instances = jnp.arange(2 * 3 * 2, dtype=jnp.float32).reshape(2, 3, 2)
    edge_inds = jnp.array([[0, 1], [1, 2]])
    src, dst = get_edge_points(instances, edge_inds)
    assert src.shape == (2, 2, 2)
    np.testing.assert_array_equal(src[0, 0], instances[0, 0])
    np.testing.assert_array_equal(dst[0, 1], instances[0, 2])


def test_make_confmaps_reference_exact_values():
    """Hardcoded oracle from the reference suite
    (/root/reference/tests/nn/data/test_confidence_maps.py:21)."""
    xv, yv = make_grid_vectors(4, 5, output_stride=1)
    points = jnp.asarray([[0.5, 1.0], [3, 3.5], [2.0, 2.0]], jnp.float32)
    cm = np.asarray(make_confmaps(points, xv, yv, sigma=1.0))
    assert cm.shape == (4, 5, 3)
    np.testing.assert_allclose(
        cm,
        [
            [[0.535, 0.0, 0.018], [0.535, 0.0, 0.082], [0.197, 0.001, 0.135],
             [0.027, 0.002, 0.082], [0.001, 0.001, 0.018]],
            [[0.882, 0.0, 0.082], [0.882, 0.006, 0.368], [0.325, 0.027, 0.607],
             [0.044, 0.044, 0.368], [0.002, 0.027, 0.082]],
            [[0.535, 0.004, 0.135], [0.535, 0.044, 0.607], [0.197, 0.197, 1.0],
             [0.027, 0.325, 0.607], [0.001, 0.197, 0.135]],
            [[0.119, 0.01, 0.082], [0.119, 0.119, 0.368], [0.044, 0.535, 0.607],
             [0.006, 0.882, 0.368], [0.0, 0.535, 0.082]],
        ],
        atol=1e-3,
    )

    # Grid-aligned peak reaches exactly 1.0; stride-2 grid places it right.
    xv, yv = make_grid_vectors(8, 8, output_stride=2)
    cm = np.asarray(make_confmaps(jnp.asarray([[2.0, 4.0]]), xv, yv, sigma=1.0))
    assert cm.shape == (4, 4, 1)
    assert cm[2, 1, 0] == 1.0
