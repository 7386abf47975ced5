"""sleap-convert CLI + COCO/DeepPoseKit importers (synthetic fixtures).

Reference analogs: sleap/io/convert.py:101 CLI, io/format/coco.py,
io/format/deepposekit.py. The reference ships no coco/dpk fixtures, so we
build minimal valid files in tmp dirs.
"""

import csv
import json
import os

import h5py
import numpy as np
import pytest

from sleap_tpu.core.labels import Labels


def test_convert_slp_to_analysis_h5_and_back(predictions_slp, tmp_path):
    from sleap_tpu.io.convert import main

    out = str(tmp_path / "preds.analysis.h5")
    main([predictions_slp, "-o", out, "--format", "analysis"])
    with h5py.File(out, "r") as f:
        assert "tracks" in f and "track_occupancy" in f
        tracks = f["tracks"][:]
    assert tracks.ndim == 4
    # frames axis spans the clip, 2 tracks.
    assert tracks.shape[0] == 2 or tracks.shape[-1] == 2


def test_convert_to_csv(predictions_slp, tmp_path):
    from sleap_tpu.io.convert import main

    out = str(tmp_path / "preds.analysis.csv")
    main([predictions_slp, "-o", out, "--format", "csv"])
    with open(out) as f:
        header = f.readline()
    assert "track" in header and "frame_idx" in header


def test_convert_unknown_format_raises(predictions_slp, tmp_path):
    from sleap_tpu.io.convert import convert

    with pytest.raises(ValueError):
        convert(predictions_slp, output_format="bogus")


def _write_coco(tmp_path, n_imgs=2):
    import cv2

    img_paths = []
    for i in range(n_imgs):
        p = str(tmp_path / f"img{i}.png")
        cv2.imwrite(p, np.zeros((32, 32, 3), np.uint8))
        img_paths.append(p)
    data = {
        "categories": [
            {
                "id": 1,
                "name": "animal",
                "keypoints": ["head", "tail"],
                "skeleton": [[1, 2]],  # 1-indexed
            }
        ],
        "images": [
            {"id": 10 + i, "file_name": os.path.basename(p)}
            for i, p in enumerate(img_paths)
        ],
        "annotations": [
            {
                "id": 1,
                "image_id": 10,
                "category_id": 1,
                # head visible, tail marked missing (v=0)
                "keypoints": [5.0, 6.0, 2, 0.0, 0.0, 0],
            },
            {
                "id": 2,
                "image_id": 11,
                "category_id": 1,
                "keypoints": [1.0, 2.0, 2, 3.0, 4.0, 1],
            },
        ],
    }
    path = str(tmp_path / "coco.json")
    with open(path, "w") as f:
        json.dump(data, f)
    return path


def test_coco_import(tmp_path):
    from sleap_tpu.io.formats import coco

    labels = coco.read_labels(_write_coco(tmp_path))
    assert len(labels) == 2
    assert labels.skeleton.node_names == ["head", "tail"]
    assert labels.skeleton.edge_inds == [(0, 1)]
    inst0 = labels[0].instances[0]
    np.testing.assert_allclose(inst0.numpy()[0], [5.0, 6.0])
    assert np.isnan(inst0.numpy()[1]).all()  # v=0 -> missing
    inst1 = labels[1].instances[0]
    np.testing.assert_allclose(inst1.numpy(), [[1, 2], [3, 4]])


def test_coco_import_through_registry(tmp_path):
    from sleap_tpu.io import formats

    path = _write_coco(tmp_path)
    labels = formats.read(path, as_format="coco")
    assert isinstance(labels, Labels) and len(labels) == 2


def _write_dpk(tmp_path, centered_pair_video):
    pose = np.zeros((2, 3, 2, 3))  # (tracks, frames, nodes, [x, y, conf])
    for t in range(2):
        for fi in range(3):
            pose[t, fi, :, 0] = 10 * t + fi
            pose[t, fi, :, 1] = np.arange(2)
            pose[t, fi, :, 2] = 1.0
    h5 = str(tmp_path / "dpk.h5")
    with h5py.File(h5, "w") as f:
        f.create_dataset("pose", data=pose)
    skel_csv = str(tmp_path / "skeleton.csv")
    with open(skel_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["name", "parent", "swap"])
        w.writeheader()
        w.writerow({"name": "head", "parent": "", "swap": ""})
        w.writerow({"name": "tail", "parent": "head", "swap": ""})
    return h5, skel_csv


def test_deepposekit_import(tmp_path, centered_pair_video):
    from sleap_tpu.io.formats import deepposekit

    h5, skel_csv = _write_dpk(tmp_path, centered_pair_video)
    labels = deepposekit.read_labels(
        h5, video_path=centered_pair_video, skeleton_path=skel_csv
    )
    assert len(labels) == 3
    assert len(labels.tracks) == 2
    assert labels.skeleton.node_names == ["head", "tail"]
    assert labels.skeleton.edge_inds == [(0, 1)]
    # Track 1, frame 2 -> x = 12.
    lf = labels[2]
    xs = sorted(inst.numpy()[0, 0] for inst in lf.instances)
    assert xs == [2.0, 12.0]


@pytest.mark.parametrize("format", ["analysis", "analysis.csv"])
def test_sleap_convert_analysis_per_video(minimal_slp, tmp_path, format):
    """Port of /root/reference/tests/io/test_convert.py:12 — per-video
    analysis exports: default filenames follow the reference scheme, one
    file per video WITH labeled frames, none for empty videos, repeatable
    -o overrides."""
    import numpy as np

    import sleap_tpu
    from sleap_tpu.io.convert import default_analysis_filename, main as sleap_convert
    from sleap_tpu.io.video import Video

    suffix = "csv" if "csv" in format else "h5"
    labels = sleap_tpu.load_file(minimal_slp)
    slp_path = str(tmp_path / "proj.slp")
    labels.save(slp_path)
    labels = sleap_tpu.load_file(slp_path)

    # Default naming: <prefix>.<idx:03>_<video_stem>.analysis.<suffix>.
    sleap_convert([f"--format", format, slp_path])
    want = default_analysis_filename(
        labels, labels.videos[0], str(tmp_path), "proj", suffix
    )
    assert os.path.exists(want)
    assert f".000_" in os.path.basename(want)

    # Explicit output path wins.
    out = str(tmp_path / f"prefix.{suffix}")
    sleap_convert(["--format", format, "-o", out, slp_path])
    assert os.path.exists(out)

    # Add a second video with NO labeled frames: it must produce NO file.
    rng = np.random.default_rng(0)
    labels.add_video(Video.from_numpy(rng.integers(0, 255, (2, 16, 16, 1), np.uint8)))
    slp2 = str(tmp_path / "two_vids.slp")
    labels.save(slp2)
    labels2 = sleap_tpu.load_file(slp2)
    sleap_convert(["--format", format, slp2])
    out0 = default_analysis_filename(
        labels2, labels2.videos[0], str(tmp_path), "two_vids", suffix
    )
    out1 = default_analysis_filename(
        labels2, labels2.videos[1], str(tmp_path), "two_vids", suffix
    )
    assert os.path.exists(out0)
    assert not os.path.exists(out1)


def test_sleap_convert_dataset_default_naming(minimal_slp, tmp_path):
    """Reference :109 — --format slp/h5/json default output is
    <input>.<format>."""
    import sleap_tpu
    from sleap_tpu.io.convert import main as sleap_convert

    labels = sleap_tpu.load_file(minimal_slp)
    slp_path = str(tmp_path / "ds.slp")
    labels.save(slp_path)
    sleap_convert(["--format", "slp", slp_path])
    assert os.path.exists(slp_path + ".slp")
    reloaded = sleap_tpu.load_file(slp_path + ".slp")
    assert len(reloaded) == len(labels)
