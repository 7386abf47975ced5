"""Data-transform edge-case matrix ported from the reference's nn/data tests.

Port of /root/reference/tests/nn/data/{test_normalization,test_resizing,
test_instance_cropping}.py numerics: exact expected values recorded from the
TF implementations' documented behavior (truncating casts, pixel-center box
geometry, extrapolation zeros).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sleap_tpu.data import normalization as norm
from sleap_tpu.data import resizing
from sleap_tpu.ops import peak_finding as pf


# --------------------------------------------------------------------- #
# normalization (reference test_normalization.py)
# --------------------------------------------------------------------- #
def test_ensure_min_image_rank():
    assert norm.ensure_min_image_rank(jnp.zeros((2, 2))).shape == (2, 2, 1)
    assert norm.ensure_min_image_rank(jnp.zeros((2, 2, 1))).shape == (2, 2, 1)


def test_ensure_float():
    assert norm.ensure_float(jnp.zeros((2, 2), jnp.uint8)).dtype == jnp.float32
    assert norm.ensure_float(jnp.zeros((2, 2), jnp.float32)).dtype == jnp.float32
    # uint8 divides by 255 (tf.image.convert_image_dtype semantics)
    np.testing.assert_allclose(
        norm.ensure_float(jnp.asarray([0, 255], jnp.uint8)), [0.0, 1.0]
    )
    np.testing.assert_allclose(
        norm.ensure_float(jnp.asarray([0, 65535], jnp.uint16)), [0.0, 1.0]
    )


def test_ensure_int():
    # [0, 1]-ranged floats scale to [0, 255] with a truncating cast.
    np.testing.assert_array_equal(
        norm.ensure_int(jnp.asarray([0.0, 0.5, 1.0])), np.array([0, 127, 255])
    )
    # Wider-ranged floats cast directly.
    np.testing.assert_array_equal(
        norm.ensure_int(jnp.asarray([0.0, 127.0, 255.0])),
        np.array([0, 127, 255]),
    )
    # Integer images pass through unchanged.
    np.testing.assert_array_equal(
        norm.ensure_int(jnp.asarray([0, 127, 255], jnp.int32)),
        np.array([0, 127, 255]),
    )
    assert norm.ensure_int(jnp.asarray([0.5])).dtype == jnp.uint8


def test_ensure_grayscale():
    np.testing.assert_array_equal(
        norm.ensure_grayscale(jnp.ones((2, 2, 3), jnp.uint8) * 255),
        np.ones((2, 2, 1), np.uint8) * 255,
    )
    np.testing.assert_array_equal(
        norm.ensure_grayscale(jnp.ones((2, 2, 1), jnp.uint8) * 255),
        np.ones((2, 2, 1), np.uint8) * 255,
    )
    np.testing.assert_allclose(
        norm.ensure_grayscale(jnp.ones((2, 2, 3), jnp.float32)),
        np.ones((2, 2, 1), np.float32),
        atol=1e-4,
    )


def test_ensure_rgb():
    np.testing.assert_array_equal(
        norm.ensure_rgb(jnp.ones((2, 2, 3), jnp.uint8) * 255),
        np.ones((2, 2, 3), np.uint8) * 255,
    )
    np.testing.assert_array_equal(
        norm.ensure_rgb(jnp.ones((2, 2, 1), jnp.uint8) * 255),
        np.ones((2, 2, 3), np.uint8) * 255,
    )


def test_convert_rgb_to_bgr():
    img_rgb = jnp.stack(
        [
            jnp.ones((2, 2), jnp.uint8) * 1,
            jnp.ones((2, 2), jnp.uint8) * 2,
            jnp.ones((2, 2), jnp.uint8) * 3,
        ],
        axis=-1,
    )
    expected_bgr = np.stack(
        [
            np.ones((2, 2), np.uint8) * 3,
            np.ones((2, 2), np.uint8) * 2,
            np.ones((2, 2), np.uint8) * 1,
        ],
        axis=-1,
    )
    np.testing.assert_array_equal(norm.convert_rgb_to_bgr(img_rgb), expected_bgr)
    # Grayscale input is RGB-expanded first.
    assert norm.convert_rgb_to_bgr(jnp.ones((2, 2, 1), jnp.uint8)).shape == (
        2,
        2,
        3,
    )


def test_scale_image_range():
    np.testing.assert_array_equal(
        norm.scale_image_range(
            jnp.asarray([0, 0.5, 1.0], jnp.float32), min_val=-1.0, max_val=1.0
        ),
        [-1, 0, 1],
    )


# --------------------------------------------------------------------- #
# resizing (reference test_resizing.py)
# --------------------------------------------------------------------- #
def test_find_padding_for_stride():
    assert resizing.find_padding_for_stride(
        image_height=127, image_width=129, max_stride=32
    ) == (1, 31)
    assert resizing.find_padding_for_stride(
        image_height=128, image_width=128, max_stride=32
    ) == (0, 0)


def test_pad_to_stride():
    np.testing.assert_array_equal(
        resizing.pad_to_stride(jnp.ones((3, 5, 1)), max_stride=2),
        np.expand_dims(
            [
                [1, 1, 1, 1, 1, 0],
                [1, 1, 1, 1, 1, 0],
                [1, 1, 1, 1, 1, 0],
                [0, 0, 0, 0, 0, 0],
            ],
            axis=-1,
        ),
    )
    assert (
        resizing.pad_to_stride(jnp.ones((3, 5, 1), jnp.uint8), max_stride=2).dtype
        == jnp.uint8
    )
    assert (
        resizing.pad_to_stride(jnp.ones((3, 5, 1), jnp.float32), max_stride=2).dtype
        == jnp.float32
    )
    assert resizing.pad_to_stride(jnp.ones((4, 4, 1)), max_stride=2).shape == (
        4,
        4,
        1,
    )


def test_resize_image():
    # scale may be an [scale_x, scale_y] pair (reference resizing.py:71).
    assert resizing.resize_image(
        jnp.ones((4, 8, 1), jnp.uint8), scale=[0.25, 3]
    ).shape == (12, 2, 1)
    assert resizing.resize_image(
        jnp.ones((4, 8, 1), jnp.uint8), scale=0.5
    ).shape == (2, 4, 1)
    assert (
        resizing.resize_image(jnp.ones((4, 8, 1), jnp.uint8), scale=0.5).dtype
        == jnp.uint8
    )
    assert (
        resizing.resize_image(jnp.ones((4, 8, 1), jnp.float32), scale=0.5).dtype
        == jnp.float32
    )
    # Truncated new size: int(5 * 0.5) == 2.
    assert resizing.resize_image(
        jnp.ones((5, 5, 1), jnp.float32), scale=0.5
    ).shape == (2, 2, 1)


# --------------------------------------------------------------------- #
# instance cropping (reference test_instance_cropping.py)
# --------------------------------------------------------------------- #
def test_make_centered_bboxes():
    bbox = pf.make_centered_bboxes(
        jnp.asarray([[1.0, 1.0]]), box_height=3, box_width=3
    )
    np.testing.assert_array_equal(bbox, [[0, 0, 2, 2]])

    bbox = pf.make_centered_bboxes(
        jnp.asarray([[2.0, 2.0]]), box_height=4, box_width=4
    )
    np.testing.assert_array_equal(bbox, [[0.5, 0.5, 3.5, 3.5]])


def test_crop_bboxes():
    xv = np.arange(4, dtype=np.uint8)
    yv = np.arange(5, dtype=np.uint8)
    XX, YY = np.meshgrid(xv, yv)
    img = np.stack([XX, YY], axis=-1)  # (5, 4, 2)

    centroids = jnp.asarray([[1.0, 1.0]])
    bboxes = pf.make_centered_bboxes(centroids, box_height=3, box_width=3)
    crops = pf.crop_bboxes(
        jnp.asarray(img)[None].astype(jnp.float32),
        bboxes,
        jnp.asarray([0]),
        crop_size=(3, 3),
    )
    patch_xx = [[0, 1, 2], [0, 1, 2], [0, 1, 2]]
    patch_yy = [[0, 0, 0], [1, 1, 1], [2, 2, 2]]
    expected = np.expand_dims(np.stack([patch_xx, patch_yy], axis=-1), axis=0)
    np.testing.assert_allclose(crops, expected, atol=1e-5)
    np.testing.assert_allclose(
        crops, np.expand_dims(img[:3, :3, :], axis=0), atol=1e-5
    )


def test_crop_bboxes_rounding():
    # Rounding-truncation regression (reference test_instance_cropping.py:55):
    # a fractional-centroid 100x100 box must still produce a 100x100 crop,
    # and fully out-of-image samples extrapolate to 0.
    bboxes = pf.make_centered_bboxes(
        jnp.asarray([[464.42838, 550.14276]]), box_height=100, box_width=100
    )
    crops = pf.crop_bboxes(
        jnp.zeros((1, 16, 16, 1), jnp.float32),
        bboxes,
        jnp.asarray([0]),
        crop_size=(100, 100),
    )
    assert crops.shape == (1, 100, 100, 1)
    np.testing.assert_array_equal(np.asarray(crops), 0.0)
