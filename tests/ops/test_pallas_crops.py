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


def test_crop_bboxes_unit_edges_match_crop_and_resize():
    """Edge boxes (partially outside the image) must read zeros outside,
    matching tf.image.crop_and_resize extrapolation_value=0."""
    import numpy as np
    import jax.numpy as jnp
    from sleap_tpu.ops.peak_finding import crop_and_resize

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 48, 48, 1), np.uint8))
    # Boxes hanging off every edge + one interior fractional box.
    tl = jnp.asarray(
        [[-8.3, -5.7], [40.2, 41.6], [-3.0, 40.9], [39.5, -7.1], [10.25, 12.75]],
        jnp.float32,
    )
    si = jnp.asarray([0, 0, 1, 1, 1], jnp.int32)
    crop = 16
    got = crop_bboxes_unit(imgs, tl, si, (crop, crop))
    # Reference path: normalized boxes through the gather-based implementation.
    boxes = jnp.stack(
        [tl[:, 1], tl[:, 0], tl[:, 1] + crop - 1, tl[:, 0] + crop - 1], axis=1
    )
    want = crop_and_resize(imgs.astype(jnp.float32), boxes, si, (crop, crop))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)
