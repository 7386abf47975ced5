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
