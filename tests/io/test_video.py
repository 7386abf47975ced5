"""Video facade + backend behaviors (reference tests/io/test_video.py).

Covers NumpyVideo, DummyVideo, MediaVideo (real mp4 decode), HDF5Video,
SingleImageVideo, the facade's shape/delegation/equality contract, and
from_filename dispatch (reference sleap/io/video.py:1001).
"""

import os

import h5py
import numpy as np
import pytest

from sleap_tpu.io.video import (
    DummyVideo,
    HDF5Video,
    MediaVideo,
    NumpyVideo,
    Video,
)


def test_numpy_video_basics():
    data = np.arange(2 * 4 * 5 * 1, dtype=np.uint8).reshape(2, 4, 5, 1)
    video = Video.from_numpy(data)
    assert video.shape == (2, 4, 5, 1)
    assert len(video) == 2
    assert video.num_frames == 2
    assert video.last_frame_idx == 1
    np.testing.assert_array_equal(video.get_frame(1), data[1])
    np.testing.assert_array_equal(video.get_frames([0, 1]), data)
    assert video.test_frame.shape == (4, 5, 1)


def test_numpy_video_adds_channel_axis():
    data = np.zeros((3, 4, 5), np.uint8)
    video = Video.from_numpy(data)
    assert video.shape == (3, 4, 5, 1)


def test_get_frames_safely_skips_bad_indices():
    video = Video.from_numpy(np.zeros((3, 4, 4, 1), np.uint8))
    idxs, frames = video.get_frames_safely([0, 99, 2])
    assert idxs == [0, 2]
    assert frames.shape == (2, 4, 4, 1)


def test_dummy_video():
    video = Video(backend=DummyVideo(filename="fake", height=8, width=6, frames=10))
    assert video.shape == (10, 8, 6, 1)
    assert video.get_frame(3).shape == (8, 6, 1)


def test_video_equality_semantics():
    a = np.zeros((2, 4, 4, 1), np.uint8)
    v1 = Video.from_numpy(a)
    v2 = Video.from_numpy(a)  # same array object
    v3 = Video.from_numpy(np.zeros((2, 4, 4, 1), np.uint8))
    assert v1 == v2
    assert v1 != v3
    # Different backend types never compare equal.
    dv = Video(backend=DummyVideo(filename="x"))
    assert v1 != dv
    # Hash is identity-based so distinct-but-equal videos can coexist in dicts.
    assert len({v1: 1, v2: 2}) == 2


def test_media_video_decode(centered_pair_video):
    video = Video.from_filename(centered_pair_video)
    assert isinstance(video.backend, MediaVideo)
    assert video.num_frames > 0
    frame = video.get_frame(0)
    assert frame.shape == (video.height, video.width, video.channels)
    assert frame.dtype == np.uint8
    # Sequential fast path yields the same frames as random access.
    f5 = video.get_frame(5)
    video.reset()
    seq = [video.get_frame(i) for i in range(6)]
    np.testing.assert_array_equal(seq[5], f5)


def test_media_video_grayscale_override(centered_pair_video):
    video = Video(backend=MediaVideo(filename=centered_pair_video, grayscale=True))
    assert video.get_frame(0).shape[-1] == 1
    rgb = Video(backend=MediaVideo(filename=centered_pair_video, grayscale=False))
    assert rgb.get_frame(0).shape[-1] == 3


def test_media_video_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        Video(backend=MediaVideo(filename="/does/not/exist.mp4")).get_frame(0)


def test_hdf5_video(tmp_path):
    data = np.random.default_rng(0).integers(0, 255, (4, 8, 8, 1), np.uint8)
    path = str(tmp_path / "vid.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("video", data=data)
    # Reference argument order: dataset first (sleap/io/video.py from_hdf5).
    video = Video.from_hdf5("video", path)
    assert isinstance(video.backend, HDF5Video)
    assert video.shape == (4, 8, 8, 1)
    np.testing.assert_array_equal(video.get_frame(2), data[2])


def test_from_filename_dispatch(tmp_path, centered_pair_video):
    assert isinstance(Video.from_filename(centered_pair_video).backend, MediaVideo)

    npy = str(tmp_path / "frames.npy")
    np.save(npy, np.zeros((2, 4, 4, 1), np.uint8))
    assert isinstance(Video.from_filename(npy).backend, NumpyVideo)

    h5 = str(tmp_path / "frames.h5")
    with h5py.File(h5, "w") as f:
        f.create_dataset("video", data=np.zeros((2, 4, 4, 1), np.uint8))
    v = Video.from_filename(h5, dataset="video")
    assert isinstance(v.backend, HDF5Video)


def test_single_image_video(tmp_path):
    import cv2

    imgs = []
    for i in range(3):
        p = str(tmp_path / f"img{i}.png")
        cv2.imwrite(p, np.full((6, 5, 3), i * 40, np.uint8))
        imgs.append(p)
    video = Video.from_image_filenames(imgs)
    assert video.num_frames == 3
    f1 = video.get_frame(1)
    assert f1.shape[0] == 6 and f1.shape[1] == 5
    assert (f1 == 40).all()


def test_hdf5_embedded_package_roundtrip(min_labels, tmp_path):
    """Embedded-image .pkg.slp: frames decode after save-with-images."""
    out = str(tmp_path / "pkg.slp")
    min_labels.save(out, with_images=True, embed_all_labeled=True)
    from sleap_tpu.core.labels import Labels

    loaded = Labels.load_file(out)
    lf = loaded[0]
    img = lf.image
    assert img is not None and img.ndim == 3
    assert loaded.video.backend.has_embedded_images


def test_mp4_facade_properties(centered_pair_video):
    # Reference test_mp4_{fps,len,dtype,get_shape,get_item} (:84-114).
    video = Video.from_filename(centered_pair_video, grayscale=True)
    assert video.fps > 0
    assert video.num_frames == len(video)
    assert video.dtype == np.uint8
    assert video.shape == (video.num_frames, video.height, video.width, 1)

    frame = video.get_frame(0)
    frames = video.get_frames([0, 1])
    assert frames.shape == (2, *frame.shape)
    np.testing.assert_array_equal(frames[0], frame)

    # __getitem__: always rank-4, scalar included (reference video.py:1152).
    sl = video[:2]
    np.testing.assert_array_equal(sl, frames)
    one = video[1]
    assert one.shape == (1, video.height, video.width, 1)
    np.testing.assert_array_equal(one[0], frames[1])
    np.testing.assert_array_equal(video[0:4:2], video.get_frames([0, 2]))


def test_video_is_missing(centered_pair_video):
    # Reference test_is_missing (:129).
    video = Video.from_filename(centered_pair_video, grayscale=True)
    assert not video.is_missing
    gone = Video.from_filename("/nonexistent/path/clip.mp4")
    assert gone.is_missing


def test_video_reset_after_decode(centered_pair_video):
    # Reference test_reset_video_mp4 (:459): reset drops the open reader and
    # decoding still works afterwards.
    video = Video.from_filename(centered_pair_video, grayscale=True)
    f0 = video.get_frame(3)
    video.backend.reset()
    np.testing.assert_array_equal(video.get_frame(3), f0)


def test_load_video_api(centered_pair_video):
    # Reference test_load_video (:417) — the top-level convenience.
    import sleap_tpu

    video = sleap_tpu.load_video(centered_pair_video, grayscale=True)
    assert video.num_frames > 0
    assert video.get_frame(0).ndim == 3


def test_get_frames_safely_all_invalid(centered_pair_video):
    # Reference test_safe_frame_loading_all_invalid (:408).
    video = Video.from_filename(centered_pair_video, grayscale=True)
    n = video.num_frames
    idxs, frames = video.get_frames_safely([n + 5, n + 6])
    assert idxs == []
    assert frames is None or len(frames) == 0


def test_hdf5_channels_first_indexing(tmp_path):
    # Reference test_hdf5_indexing (:284): channels_first datasets transpose
    # back to (H, W, C) on read.
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (3, 2, 12, 10), np.uint8)  # (frames, C, H, W)
    path = str(tmp_path / "vid.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("video", data=data)
    video = Video.from_filename(path, dataset="video", input_format="channels_first")
    assert video.shape == (3, 12, 10, 2)
    frame = video.get_frame(1)
    np.testing.assert_array_equal(frame, np.moveaxis(data[1], 0, -1))


REF_VIDEOS = "/root/reference/tests/data/videos"


@pytest.mark.skipif(
    not os.path.isdir(REF_VIDEOS), reason="reference fixtures absent"
)
def test_reset_video_mp4_reconfigures():
    """Reference test_reset_video_mp4 (:459): reset(grayscale=...) flips the
    channel mode of subsequent reads in both directions."""
    video = Video.from_filename(os.path.join(REF_VIDEOS, "small_robot.mp4"))
    filename = video.backend.filename
    video.get_frame(0)

    video.backend.reset(filename=filename, grayscale=True)
    frame = video.get_frame(0)
    assert frame.shape[2] == 1
    assert video.backend.grayscale is True

    video.backend.reset(filename=filename, grayscale=False)
    frame = video.get_frame(0)
    assert frame.shape[2] == 3
    assert video.backend.grayscale is False

    # grayscale omitted with a filename -> re-detect; bgr passthrough kept.
    video.backend.reset(filename=filename, bgr=True)
    assert video.backend.bgr is True
    assert video.backend.grayscale is None
    video.get_frame(0)
    assert video.backend.grayscale is not None


@pytest.mark.skipif(
    not os.path.isdir(REF_VIDEOS), reason="reference fixtures absent"
)
def test_reset_video_single_image():
    """Reference test_reset_video_siv (:501): reset flips grayscale, can
    repoint at a filename list, and rejects filename+filenames together."""
    f0 = os.path.join(REF_VIDEOS, "robot0.jpg")
    fns = [os.path.join(REF_VIDEOS, f"robot{i}.jpg") for i in range(3)]

    video = Video.from_filename(f0)
    video.get_frame(0)

    video.backend.reset(filename=f0, grayscale=True)
    frame = video.get_frame(0)
    assert frame.shape[2] == 1

    video.backend.reset(filename=f0, grayscale=False)
    frame = video.get_frame(0)
    assert frame.shape[2] == 3

    # Repoint at a list of images.
    video.backend.reset(filenames=fns)
    assert video.backend.filenames == fns
    assert len(video) == 3
    video.get_frame(2)

    # Both filename and filenames is ambiguous.
    with pytest.raises(ValueError):
        video.backend.reset(filename=f0, filenames=fns)
    assert video.backend.filenames == fns
