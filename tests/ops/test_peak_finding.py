import numpy as np
import pytest

import jax.numpy as jnp

from sleap_tpu.ops.grid import make_grid_vectors
from sleap_tpu.ops.confmaps import make_confmaps, make_multi_confmaps
from sleap_tpu.ops.peak_finding import (
    crop_and_resize,
    find_global_peaks,
    find_global_peaks_rough,
    find_global_peaks_with_offsets,
    find_local_peaks,
    find_offsets_local_direction,
    flatten_local_peaks,
    integral_regression,
    make_centered_bboxes,
    make_gaussian_kernel,
    smooth_imgs,
)


def make_cms(points, size=32, sigma=1.5):
    """(1, size, size, n_nodes) confmaps for one instance."""
    xv, yv = make_grid_vectors(size, size, 1)
    return make_confmaps(jnp.asarray(points, jnp.float32), xv, yv, sigma)[None]


def test_find_global_peaks_rough():
    cms = make_cms([[7.0, 11.0], [20.0, 3.0]])
    peaks, vals = find_global_peaks_rough(cms, threshold=0.1)
    assert peaks.shape == (1, 2, 2)
    np.testing.assert_allclose(peaks[0], [[7, 11], [20, 3]])
    np.testing.assert_allclose(vals[0], [1.0, 1.0], rtol=1e-5)


def test_find_global_peaks_rough_threshold_nan():
    cms = jnp.zeros((1, 16, 16, 1)).at[0, 4, 4, 0].set(0.05)
    peaks, vals = find_global_peaks_rough(cms, threshold=0.1)
    assert bool(jnp.all(jnp.isnan(peaks)))
    assert vals[0, 0] == pytest.approx(0.05)


def test_find_global_peaks_integral_subpixel():
    """A subpixel-shifted Gaussian is recovered to high accuracy."""
    true_pts = np.array([[7.3, 11.6], [20.8, 3.2]])
    cms = make_cms(true_pts, sigma=2.0)
    rough, _ = find_global_peaks(cms, threshold=0.1)
    peaks, vals = find_global_peaks(cms, threshold=0.1, refinement="integral")
    # The 5x5 truncated integral estimator is biased toward the grid peak
    # (same as the reference); assert subpixel movement toward the truth.
    np.testing.assert_allclose(peaks[0], true_pts, atol=0.25)
    err_rough = np.abs(np.asarray(rough[0]) - true_pts).max()
    err_ref = np.abs(np.asarray(peaks[0]) - true_pts).max()
    assert err_ref < err_rough


def test_find_global_peaks_local_refinement():
    true_pts = [[7.3, 11.6]]
    cms = make_cms(true_pts, sigma=2.0)
    peaks, _ = find_global_peaks(cms, threshold=0.1, refinement="local")
    # Rough peak (7, 12) nudged by +-0.25 toward the true location.
    np.testing.assert_allclose(peaks[0], [[7.25, 11.75]], atol=1e-6)


def test_find_global_peaks_refinement_keeps_nan():
    cms = jnp.zeros((1, 16, 16, 2)).at[0, 4, 4, 0].set(1.0)
    peaks, _ = find_global_peaks(cms, threshold=0.5, refinement="integral")
    assert not np.any(np.isnan(np.asarray(peaks[0, 0])))
    assert bool(jnp.all(jnp.isnan(peaks[0, 1])))


def test_hierarchical_top_k_matches_flat():
    """The two-stage top-k (bottom-up hot-path optimization) is exact."""
    from jax import lax

    from sleap_tpu.ops.peak_finding import _hierarchical_top_k

    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(3, 5, 64 * 1024)).astype("f4"))
    fv, fi = _hierarchical_top_k(vals, 16)
    rv, ri = lax.top_k(vals, 16)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ri))
    # Small / non-divisible axes fall back to flat top_k.
    small = jnp.asarray(rng.normal(size=(2, 100)).astype("f4"))
    sv, si = _hierarchical_top_k(small, 4)
    rv2, ri2 = lax.top_k(small, 4)
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv2))


def test_find_local_peaks_static():
    xv, yv = make_grid_vectors(48, 48, 1)
    instances = jnp.array(
        [
            [[10.0, 10.0], [30.0, 12.0]],
            [[12.0, 36.0], [36.0, 30.0]],
        ]
    )
    cms = make_multi_confmaps(instances, xv, yv, sigma=1.5)[None]
    peaks, vals, mask = find_local_peaks(cms, max_peaks=4, threshold=0.2)
    assert peaks.shape == (1, 2, 4, 2)
    assert int(mask.sum()) == 4  # 2 peaks per channel
    # channel 0 (first node of both instances):
    got = sorted(np.asarray(peaks[0, 0][mask[0, 0]]).tolist())
    np.testing.assert_allclose(got, [[10, 10], [12, 36]])
    got1 = sorted(np.asarray(peaks[0, 1][mask[0, 1]]).tolist())
    np.testing.assert_allclose(got1, [[30, 12], [36, 30]])
    # Invalid slots are NaN / 0.
    assert bool(jnp.all(jnp.isnan(peaks[0, 0, 2:])))
    assert float(vals[0, 0, 2]) == 0.0


def test_find_local_peaks_integral_refinement():
    xv, yv = make_grid_vectors(48, 48, 1)
    instances = jnp.array([[[10.4, 10.0]], [[30.0, 12.7]]])
    cms = make_multi_confmaps(instances, xv, yv, sigma=2.0)[None]
    peaks, vals, mask = find_local_peaks(
        cms, max_peaks=3, threshold=0.2, refinement="integral"
    )
    got = np.asarray(peaks[0, 0][mask[0, 0]])
    got = got[np.argsort(got[:, 0])]
    np.testing.assert_allclose(got, [[10.4, 10.0], [30.0, 12.7]], atol=0.25)


def test_find_local_peaks_plateau_not_peak():
    """Two adjacent equal maxima: strictly-greater NMS rejects both."""
    cms = jnp.zeros((1, 16, 16, 1)).at[0, 5, 5, 0].set(1.0).at[0, 5, 6, 0].set(1.0)
    _, _, mask = find_local_peaks(cms, max_peaks=4, threshold=0.2)
    assert int(mask.sum()) == 0


def test_flatten_local_peaks():
    cms = jnp.zeros((2, 16, 16, 1)).at[0, 5, 5, 0].set(1.0).at[1, 8, 9, 0].set(0.9)
    peaks, vals, mask = find_local_peaks(cms, max_peaks=4, threshold=0.2)
    pts, vs, sample_inds, channel_inds = flatten_local_peaks(peaks, vals, mask)
    assert pts.shape == (2, 2)
    np.testing.assert_array_equal(sample_inds, [0, 1])
    np.testing.assert_allclose(pts, [[5, 5], [9, 8]])


def test_integral_regression_centered():
    xv = jnp.arange(5, dtype=jnp.float32) - 2
    g = jnp.exp(-(xv.reshape(1, -1) ** 2 + xv.reshape(-1, 1) ** 2) / 2)[None, ..., None]
    x_hat, y_hat = integral_regression(g, xv, xv)
    assert float(x_hat[0, 0]) == pytest.approx(0.0, abs=1e-6)
    assert float(y_hat[0, 0]) == pytest.approx(0.0, abs=1e-6)


def test_find_offsets_local_direction():
    patch = jnp.array(
        [[0.0, 1.0, 0.0], [1.0, 3.0, 2.0], [0.0, 1.0, 0.0]]
    ).reshape(1, 3, 3, 1)
    off = find_offsets_local_direction(patch, 0.25)
    np.testing.assert_allclose(off[0], [0.25, 0.0])


def test_make_centered_bboxes():
    boxes = make_centered_bboxes(jnp.array([[1.0, 1.0]]), 3, 3)
    np.testing.assert_allclose(boxes[0], [0, 0, 2, 2])


def test_crop_and_resize_exact_patch():
    img = jnp.arange(25, dtype=jnp.float32).reshape(1, 5, 5, 1)
    boxes = make_centered_bboxes(jnp.array([[1.0, 1.0]]), 3, 3)
    crop = crop_and_resize(img, boxes, jnp.array([0]), (3, 3))
    np.testing.assert_allclose(crop[0, ..., 0], np.arange(25).reshape(5, 5)[0:3, 0:3])


def test_crop_and_resize_out_of_bounds_zero():
    img = jnp.ones((1, 5, 5, 1), jnp.float32)
    boxes = make_centered_bboxes(jnp.array([[0.0, 0.0]]), 3, 3)
    crop = crop_and_resize(img, boxes, jnp.array([0]), (3, 3))
    # Top row / left col outside -> zeros; inside -> ones.
    np.testing.assert_allclose(crop[0, ..., 0], [[0, 0, 0], [0, 1, 1], [0, 1, 1]])


def test_crop_and_resize_bilinear_subpixel():
    img = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    boxes = jnp.array([[0.5, 0.5, 1.5, 1.5]])  # half-pixel offset 2x2
    crop = crop_and_resize(img, boxes, jnp.array([0]), (2, 2))
    np.testing.assert_allclose(crop[0, ..., 0], [[2.5, 3.5], [6.5, 7.5]])


def test_find_global_peaks_with_offsets():
    cms = jnp.zeros((1, 16, 16, 1)).at[0, 5, 7, 0].set(1.0)
    offsets = jnp.full((1, 16, 16, 2), 0.0).at[0, 5, 7].set(jnp.array([0.3, -0.2]))
    peaks, vals = find_global_peaks_with_offsets(cms, offsets, threshold=0.2)
    np.testing.assert_allclose(peaks[0, 0], [7.3, 4.8], rtol=1e-6)


def test_smooth_imgs():
    img = jnp.zeros((1, 15, 15, 2)).at[0, 7, 7, 0].set(1.0).at[0, 3, 3, 1].set(1.0)
    sm = smooth_imgs(img, kernel_size=5, sigma=1.0)
    assert sm.shape == (1, 15, 15, 2)
    # Peak stays at the same location, mass spreads.
    assert int(jnp.argmax(sm[0, ..., 0])) == 7 * 15 + 7
    assert float(sm[0, 7, 7, 0]) < 1.0
    # Truncated 5x5 kernel normalized by the analytic 2*pi*sigma^2 carries
    # ~98.2% of the mass (identical to the reference's kernel).
    assert float(jnp.sum(sm[0, ..., 0])) == pytest.approx(0.9823, abs=1e-3)


def test_find_local_peaks_channels_first_matches():
    """(C,S,H,W) input (channels-first head layout) == NHWC path exactly."""
    rng = np.random.RandomState(0)
    xv, yv = make_grid_vectors(64, 64, 1)
    instances = jnp.asarray(rng.uniform(4, 60, size=(3, 5, 2)), jnp.float32)
    cms = make_multi_confmaps(instances, xv, yv, sigma=1.5)
    cms = jnp.stack([cms, cms * 0.9], axis=0)  # (S=2, H, W, C=5)
    for refinement in (None, "integral"):
        ref = find_local_peaks(
            cms, max_peaks=4, threshold=0.2, refinement=refinement
        )
        got = find_local_peaks(
            jnp.transpose(cms, (3, 0, 1, 2)),
            max_peaks=4, threshold=0.2, refinement=refinement,
            channels_first=True,
        )
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_channels_first_head_matches_conv():
    """_ChannelsFirstConv1x1 shares nn.Conv's param tree and matches its
    output (transposed) bit-for-bit in f32."""
    import flax.linen as nn
    import jax

    from sleap_tpu.models.model import _ChannelsFirstConv1x1

    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 7), jnp.float32)
    conv = nn.Conv(features=5, kernel_size=(1, 1), padding="SAME", name="h")
    cf = _ChannelsFirstConv1x1(features=5, name="h")
    v = conv.init(jax.random.PRNGKey(0), x)
    jax.tree_util.tree_map(  # identical param tree -> checkpoints interchange
        lambda a, b: None,
        v, cf.init(jax.random.PRNGKey(0), x),
    )
    ref = conv.apply(v, x)  # (S, H, W, K)
    got = cf.apply(v, x)  # (K, S, H, W)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (1, 2, 3, 0))), np.asarray(ref),
        atol=1e-6,
    )
