"""Experimental pallas crop kernel: interpret-mode correctness only."""

import numpy as np
import pytest

import jax.numpy as jnp

from sleap_tpu.ops.pallas_crops import crop_bboxes_unit_pallas
from sleap_tpu.ops.peak_finding import crop_bboxes_unit


def test_crop_kernel_interpret_matches_xla():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 1), np.uint8))
    cents = jnp.asarray(rng.uniform(5, 59, (6, 2)).astype("f4"))
    si = jnp.asarray([0, 1, 0, 1, 0, 1], jnp.int32)
    tl = cents - (16 - 1) / 2.0
    a = crop_bboxes_unit(imgs, tl, si, (16, 16))
    b = crop_bboxes_unit_pallas(imgs, tl, si, (16, 16), interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
