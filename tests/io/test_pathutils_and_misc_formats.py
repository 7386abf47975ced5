"""Tests for pathutils, generic json/text adaptors, Video.to_hdf5, and
gated backends (imgstore/nix/pretrained encoders)."""

import numpy as np
import pytest

from sleap_tpu.io import pathutils
from sleap_tpu.io import formats
from sleap_tpu.io.video import ImgStoreVideo, Video


def test_list_file_missing(tmp_path):
    exists = tmp_path / "a.txt"
    exists.write_text("x")
    missing = pathutils.list_file_missing([str(exists), str(tmp_path / "nope")])
    assert missing == [False, True]


def test_find_changed_subpath():
    old, new = pathutils.find_changed_subpath(
        "/data/proj/videos/clip.mp4", "/mnt/nas/videos/clip.mp4"
    )
    assert old == "/data/proj"
    assert new == "/mnt/nas"


def test_fix_path_separator():
    assert pathutils.fix_path_separator("C:\\data\\clip.mp4") == "C:/data/clip.mp4"


def test_filenames_prefix_change(tmp_path, monkeypatch):
    monkeypatch.setattr(
        pathutils, "_PREFIX_STORE", str(tmp_path / "prefixes.yaml")
    )
    real = tmp_path / "videos" / "clip.mp4"
    real.parent.mkdir()
    real.write_text("")
    filenames = ["/old/place/videos/clip.mp4", "/old/place/videos/ghost.mp4"]
    missing = pathutils.list_file_missing(filenames)
    pathutils.filenames_prefix_change(
        filenames, "/old/place", str(tmp_path), missing=missing
    )
    assert filenames[0] == str(real)
    assert missing == [False, True]
    # The learned prefix swap repairs other lists automatically.
    others = ["/old/place/videos/clip.mp4"]
    pathutils.fix_paths_with_saved_prefix(others)
    assert others[0] == str(real)


def test_generic_json_roundtrip(tmp_path):
    p = str(tmp_path / "thing.json")
    formats.write_json(p, {"a": [1, 2]})
    assert formats.read_json(p) == {"a": [1, 2]}
    assert formats.read(p) == {"a": [1, 2]}  # dispatch sniffs genericjson


def test_generic_text_roundtrip(tmp_path):
    p = str(tmp_path / "notes.txt")
    formats.write_text(p, "hello\n")
    assert formats.read_text(p) == "hello\n"
    assert formats.sniff_format(p) == "text"
    assert formats.read(p) == "hello\n"


def test_nix_read_is_write_only(tmp_path):
    """NIX is write-only (reference nix.py:75); read raises ValueError."""
    p = tmp_path / "out.nix"
    p.write_bytes(b"")
    with pytest.raises(ValueError, match="write-only"):
        formats.read(str(p))


def test_imgstore_roundtrip(tmp_path):
    """to_imgstore -> ImgStoreVideo roundtrip via the vendored directory
    store (reference io/video.py:611-818, 1318-1397)."""
    import numpy as np

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, size=(7, 12, 16, 1), dtype=np.uint8)
    video = Video.from_numpy(frames)
    store_dir = str(tmp_path / "store")
    # Select a sparse subset of original frame numbers; chunksize in the
    # vendored writer is exercised across chunk boundaries elsewhere.
    iv = video.to_imgstore(store_dir, frame_numbers=[1, 3, 6])
    assert isinstance(iv.backend, ImgStoreVideo)
    assert iv.num_frames == 3
    # index_by_original=True: fetch by original frame number.
    np.testing.assert_array_equal(iv.get_frame(3), frames[3])
    np.testing.assert_array_equal(iv.get_frame(6), frames[6])
    # index_by_original=False: fetch by store position.
    iv2 = Video(backend=ImgStoreVideo(filename=store_dir, index_by_original=False))
    np.testing.assert_array_equal(iv2.get_frame(0), frames[1])
    np.testing.assert_array_equal(iv2.get_frame(2), frames[6])
    assert (iv.height, iv.width, iv.channels) == (12, 16, 1)


def test_imgstore_chunk_boundaries(tmp_path):
    """Stores spanning multiple chunks read back correctly."""
    import numpy as np

    from sleap_tpu.io import dirimgstore

    frames = np.arange(5 * 4 * 4, dtype=np.uint8).reshape(5, 4, 4)
    store = dirimgstore.new_for_format(
        "png", basedir=str(tmp_path / "s"), imgshape=(4, 4), chunksize=2
    )
    for i, f in enumerate(frames):
        store.add_image(f, i * 10, float(i))
    store.close()

    rd = dirimgstore.new_for_filename(str(tmp_path / "s"))
    assert rd.frame_count == 5
    assert (rd.frame_min, rd.frame_max) == (0, 40)
    img, (fn, ft) = rd.get_image(frame_number=30)
    np.testing.assert_array_equal(img, frames[3])
    assert (fn, ft) == (30, 3.0)
    img, (fn, _) = rd.get_next_image()  # cursor advanced past 30
    assert fn == 40
    np.testing.assert_array_equal(img, frames[4])


def test_pretrained_encoder_builds():
    """Pretrained-encoder backbones are first-class now (round 2); only an
    unknown encoder name raises."""
    import sleap_tpu.config as cfg
    from sleap_tpu.models.model import Model

    c = cfg.ModelConfig(
        backbone=cfg.BackboneConfig(
            pretrained_encoder=cfg.PretrainedEncoderConfig(encoder="resnet18")
        ),
        heads=cfg.HeadsConfig(centroid=cfg.CentroidsHeadConfig()),
    )
    model = Model.from_config(c)
    assert model.backbone.maximum_stride == 32
    c.backbone.pretrained_encoder.encoder = "senet154"
    with pytest.raises(ValueError, match="nearest supported family"):
        Model.from_config(c)


def test_video_to_hdf5_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (5, 12, 16, 1), np.uint8)
    video = Video.from_numpy(frames)
    out = str(tmp_path / "store.h5")
    hv = video.to_hdf5(out, dataset="vid", frame_numbers=[0, 2, 4])
    assert hv.num_frames == 3
    # index_by_original: frame 2 of the source is addressable as 2.
    np.testing.assert_array_equal(hv.get_frame(2), frames[2])

    import h5py

    with h5py.File(out, "r") as f:
        assert list(f["vid/frame_numbers"][:]) == [0, 2, 4]
        assert "json" in f["vid/source_video"].attrs


def test_video_to_hdf5_encoded(tmp_path):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (3, 8, 8, 1), np.uint8)
    video = Video.from_numpy(frames)
    out = str(tmp_path / "enc.h5")
    hv = video.to_hdf5(out, dataset="vid", format="png")
    np.testing.assert_array_equal(hv.get_frame(1), frames[1])
