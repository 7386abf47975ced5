"""Embedded-frame store parity: to_imgstore / to_hdf5 round trips.

Ports the reference's imgstore + inline-HDF5 matrix
(``/root/reference/tests/io/test_video.py:139-335``): format variants,
index-by-original vs index-by-row semantics, `last_frame_idx` overrides,
source-video fallback + the `enable_source_video` toggle, deferred loading,
single-channel stores, and empty stores.
"""

import os

import numpy as np
import pytest

from sleap_tpu.io.video import Video

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixtures absent"
)


@pytest.fixture
def small_robot_vid():
    return Video.from_media(os.path.join(DATA, "videos", "small_robot.mp4"))


@pytest.fixture
def centered_pair_vid():
    return Video.from_media(
        os.path.join(DATA, "videos", "centered_pair_small.mp4"), grayscale=True
    )


# ------------------------------------------------------------------ imgstore


@pytest.mark.parametrize("format", ["png", "jpg", "mjpeg/avi"])
def test_imgstore_video(small_robot_vid, tmpdir, format):
    path = os.path.join(tmpdir, "test_imgstore")
    # Video formats fall back to png in the vendored store; save all frames
    # for that branch like the reference does.
    frame_indices = None if format == "mjpeg/avi" else [0, 1, 5]

    if format == "png":
        imgstore_vid = small_robot_vid.to_imgstore(path, frame_numbers=frame_indices)
    else:
        imgstore_vid = small_robot_vid.to_imgstore(
            path, frame_numbers=frame_indices, format=format
        )

    if frame_indices is None:
        assert small_robot_vid.num_frames == imgstore_vid.num_frames
        for i in range(10):
            assert type(imgstore_vid.get_frame(i)) == np.ndarray
    else:
        assert imgstore_vid.num_frames == len(frame_indices)
        for i in frame_indices:
            assert type(imgstore_vid.get_frame(i)) == np.ndarray

    assert imgstore_vid.channels == 3
    assert imgstore_vid.height == 320
    assert imgstore_vid.width == 560

    if format == "png":  # lossless round trip
        np.testing.assert_array_equal(
            imgstore_vid.get_frame(0), small_robot_vid.get_frame(0)
        )


def test_imgstore_indexing(small_robot_vid, tmpdir):
    path = os.path.join(tmpdir, "test_imgstore")
    frame_indices = [20, 40, 15]

    imgstore_vid = small_robot_vid.to_imgstore(
        path, frame_numbers=frame_indices, index_by_original=False
    )
    frames = imgstore_vid.get_frames([0, 1, 2])
    assert frames.shape == (3, 320, 560, 3)
    assert imgstore_vid.last_frame_idx == len(frame_indices) - 1
    with pytest.raises(ValueError):
        imgstore_vid.get_frames(frame_indices)

    # Re-create with frame-number indexing (the default).
    path2 = os.path.join(tmpdir, "test_imgstore2")
    imgstore_vid = small_robot_vid.to_imgstore(path2, frame_numbers=frame_indices)
    frames = imgstore_vid.get_frames(frame_indices)
    assert frames.shape == (3, 320, 560, 3)
    assert imgstore_vid.last_frame_idx == max(frame_indices)
    with pytest.raises(ValueError):
        imgstore_vid.get_frames([0, 1, 2])


def test_imgstore_deferred_loading(small_robot_vid, tmpdir):
    path = os.path.join(tmpdir, "test_imgstore")
    vid = small_robot_vid.to_imgstore(path, frame_numbers=[20, 40, 15])
    assert vid.dtype == np.dtype("uint8")


def test_imgstore_single_channel(centered_pair_vid, tmpdir):
    path = os.path.join(tmpdir, "test_imgstore")
    vid = centered_pair_vid.to_imgstore(path, frame_numbers=[20, 40, 15])
    assert vid.channels == 1


def test_imgstore_no_frames(small_robot_vid, tmpdir):
    path = os.path.join(tmpdir, "test_imgstore")
    vid = small_robot_vid.to_imgstore(path, frame_numbers=[])
    assert vid.dtype == np.dtype("uint8")


def test_imgstore_from_serialization(small_robot_vid, tmpdir):
    """Store round-trips through the videos_json dict form."""
    path = os.path.join(tmpdir, "test_imgstore")
    vid = small_robot_vid.to_imgstore(path, frame_numbers=[0, 1, 5])
    vid2 = Video.from_dict(vid.to_dict())
    np.testing.assert_array_equal(vid2.get_frame(5), vid.get_frame(5))


# ------------------------------------------------------------------ hdf5


def test_empty_hdf5_video(small_robot_vid, tmpdir):
    path = os.path.join(tmpdir, "test_to_hdf5")
    small_robot_vid.to_hdf5(path, "testvid", frame_numbers=[])


@pytest.mark.parametrize("format", ["", "png", "jpg"])
def test_hdf5_inline_video(small_robot_vid, tmpdir, format):
    path = os.path.join(tmpdir, f"test_to_hdf5_{format.replace('/', '_')}")
    frame_indices = [0, 1, 5]

    hdf5_vid = small_robot_vid.to_hdf5(
        path, "testvid", format=format, frame_numbers=frame_indices
    )
    assert hdf5_vid.num_frames == len(frame_indices)
    for i in frame_indices:
        assert type(hdf5_vid.get_frame(i)) == np.ndarray

    assert hdf5_vid.channels == 3
    assert hdf5_vid.height == 320
    assert hdf5_vid.width == 560

    # A frame NOT embedded falls back to the recorded source video.
    assert hdf5_vid.get_frame(3).shape == (320, 560, 3)

    if format in ("", "png"):  # lossless round trip
        np.testing.assert_array_equal(
            hdf5_vid.get_frame(0), small_robot_vid.get_frame(0)
        )


def test_hdf5_indexing(small_robot_vid, tmpdir):
    path = os.path.join(tmpdir, "test_to_hdf5")
    frame_indices = [20, 40, 15]

    hdf5_vid = small_robot_vid.to_hdf5(
        path, dataset="testvid2", frame_numbers=frame_indices, index_by_original=False
    )
    frames = hdf5_vid.get_frames([0, 1, 2])
    assert frames.shape == (3, 320, 560, 3)
    assert hdf5_vid.last_frame_idx == len(frame_indices) - 1

    hdf5_vid.backend.enable_source_video = False
    with pytest.raises(IndexError):
        hdf5_vid.get_frames(frame_indices)

    # Close before appending another dataset to the same file.
    hdf5_vid.close()

    hdf5_vid2 = small_robot_vid.to_hdf5(
        path, dataset="testvid3", frame_numbers=frame_indices
    )
    assert hdf5_vid2.has_embedded_images
    assert hdf5_vid2.source_video_available
    hdf5_vid2.backend.enable_source_video = False
    assert hdf5_vid2.has_embedded_images
    assert not hdf5_vid2.source_video_available

    frames = hdf5_vid2.get_frames(frame_indices)
    assert frames.shape == (3, 320, 560, 3)
    assert hdf5_vid2.embedded_frame_inds == frame_indices
    assert hdf5_vid2.last_frame_idx == max(frame_indices)
    with pytest.raises(IndexError):
        hdf5_vid2.get_frames([0, 1, 2])
