"""Pallas crop kernel (DMA + dynamic-roll realignment): interpret-mode
correctness vs the XLA path, including out-of-image boxes."""

import numpy as np
import pytest

import jax.numpy as jnp

from sleap_tpu.ops.pallas_crops import (
    crop_bboxes_unit_pallas,
    crop_bboxes_unit_pallas_ok,
)
from sleap_tpu.ops.peak_finding import crop_bboxes_unit


def test_crop_kernel_interpret_matches_xla():
    rng = np.random.default_rng(0)
    H = W = 512
    ch = cw = 128
    imgs = jnp.asarray(rng.integers(0, 255, (3, H, W, 1), np.uint8))
    assert crop_bboxes_unit_pallas_ok(imgs.shape, (ch, cw), imgs.dtype)
    # Interior fractional + all-four-edges overflow boxes.
    tl = jnp.asarray(
        [
            [100.3, 200.7],
            [-20.5, -10.2],
            [450.9, 30.0],
            [30.0, 430.25],
            [-5.0, 440.5],
            [0.0, 0.0],
        ],
        jnp.float32,
    )
    si = jnp.asarray([0, 1, 2, 0, 1, 2], jnp.int32)
    a = crop_bboxes_unit(imgs, tl, si, (ch, cw))
    b = crop_bboxes_unit_pallas(imgs, tl, si, (ch, cw), interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_crop_kernel_gate_rejects_unsupported():
    # Multi-channel, unaligned crop sizes, and too-small canvases fall back.
    assert not crop_bboxes_unit_pallas_ok((2, 512, 512, 3), (128, 128), jnp.uint8)
    assert not crop_bboxes_unit_pallas_ok((2, 512, 512, 1), (100, 128), jnp.uint8)
    assert not crop_bboxes_unit_pallas_ok((2, 512, 512, 1), (128, 100), jnp.uint8)
    assert not crop_bboxes_unit_pallas_ok((2, 64, 64, 1), (128, 128), jnp.uint8)


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
