"""Pallas fused peak kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sleap_tpu.ops.confmaps import make_confmaps
from sleap_tpu.ops.grid import make_grid_vectors
from sleap_tpu.ops.pallas_peaks import find_global_peaks_integral_pallas
from sleap_tpu.ops.peak_finding import find_global_peaks


def test_pallas_matches_xla_path():
    xv, yv = make_grid_vectors(64, 64, 1)
    pts = jnp.array([[17.3, 25.6], [40.8, 11.2], [5.1, 60.9]])
    cms = make_confmaps(pts, xv, yv, 2.0)[None]
    a, av = find_global_peaks(cms, threshold=0.2, refinement="integral")
    b, bv = find_global_peaks_integral_pallas(cms, threshold=0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(av), np.asarray(bv), atol=1e-6)


def test_pallas_threshold_nan():
    cms = jnp.zeros((2, 32, 32, 3)).at[0, 5, 5, 0].set(0.1).at[1, 7, 9, 2].set(0.9)
    pts, vals = find_global_peaks_integral_pallas(cms, threshold=0.2, interpret=True)
    pts = np.asarray(pts)
    assert np.isnan(pts[0]).all()
    assert np.isnan(pts[1, :2]).all()
    np.testing.assert_allclose(pts[1, 2], [9, 7], atol=0.5)


def test_pallas_nonmultiple_of_block():
    """Map counts not divisible by the block size are padded correctly."""
    cms = jnp.zeros((1, 16, 16, 3)).at[0, 4, 6, 1].set(1.0)
    pts, vals = find_global_peaks_integral_pallas(cms, threshold=0.2, interpret=True)
    pts = np.asarray(pts)
    np.testing.assert_allclose(pts[0, 1], [6, 4], atol=0.3)
    assert np.isnan(pts[0, 0]).all() and np.isnan(pts[0, 2]).all()
