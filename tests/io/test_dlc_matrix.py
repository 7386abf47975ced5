"""DeepLabCut import exact-value matrix.

Ports the reference's ``tests/io/test_formats.py::test_madlc/maudlc/sadlc``
(reference sleap/io/format/deeplabcut.py): per-frame instance counts, exact
point values, skipped all-NaN frames keeping their original frame indices,
and the multi-animal "single" (unique-bodyparts) pseudo-individual getting
its own track spawned at its first labeled frame.
"""

import os

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from sleap_tpu.io import formats

REF = "/root/reference/tests/data"
DLC = os.path.join(REF, "dlc", "labeled-data", "video")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DLC), reason="reference fixtures absent"
)


@pytest.mark.parametrize(
    "test_data",
    [
        os.path.join(DLC, "madlc_testdata.csv"),
        os.path.join(DLC, "madlc_testdata_v2.csv"),
    ],
)
def test_madlc(test_data):
    labels = formats.read(test_data, as_format="deeplabcut")

    assert labels.skeleton.node_names == ["A", "B", "C"]
    assert len(labels.videos) == 1
    fns = labels.video.backend.filenames
    assert len(fns) == 4
    for i in range(4):
        assert fns[i].endswith(f"img00{i}.png")

    # Frames with no coordinates at all are not labeled.
    assert len(labels) == 3

    assert len(labels[0]) == 2
    assert len(labels[1]) == 2
    assert len(labels[2]) == 1

    assert_array_equal(labels[0][0].numpy(), [[0, 1], [2, 3], [4, 5]])
    assert_array_equal(labels[0][1].numpy(), [[6, 7], [8, 9], [10, 11]])
    assert_array_equal(
        labels[1][0].numpy(), [[12, 13], [np.nan, np.nan], [15, 16]]
    )
    assert_array_equal(
        labels[1][1].numpy(), [[17, 18], [np.nan, np.nan], [20, 21]]
    )
    assert_array_equal(labels[2][0].numpy(), [[22, 23], [24, 25], [26, 27]])
    assert labels[2].frame_idx == 3


@pytest.mark.parametrize(
    "test_data",
    [
        os.path.join(DLC, "maudlc_testdata.csv"),
        os.path.join(DLC, "maudlc_testdata_v2.csv"),
        os.path.join(REF, "dlc", "madlc_230_config.yaml"),
    ],
)
def test_maudlc(test_data):
    labels = formats.read(test_data, as_format="deeplabcut")

    assert labels.skeleton.node_names == ["A", "B", "C", "D", "E"]
    assert len(labels.videos) == 1
    fns = labels.video.backend.filenames
    assert len(fns) == 4

    assert len(labels) == 3
    assert len(labels[0]) == 2
    assert len(labels[1]) == 3
    assert len(labels[2]) == 2

    nn = [np.nan, np.nan]
    assert_array_equal(labels[0][0].numpy(), [[0, 1], [2, 3], [4, 5], nn, nn])
    assert_array_equal(labels[0][1].numpy(), [[6, 7], [8, 9], [10, 11], nn, nn])
    assert_array_equal(labels[1][0].numpy(), [[12, 13], nn, [15, 16], nn, nn])
    assert_array_equal(labels[1][1].numpy(), [[17, 18], nn, [20, 21], nn, nn])
    assert_array_equal(labels[1][2].numpy(), [nn, nn, nn, [22, 23], [24, 25]])
    assert_array_equal(labels[2][0].numpy(), [[26, 27], [28, 29], [30, 31], nn, nn])
    assert_array_equal(labels[2][1].numpy(), [nn, nn, nn, [32, 33], [34, 35]])
    assert labels[2].frame_idx == 3

    # Tracks: the named animals spawn at frame 0; the "single" unique-
    # bodyparts pseudo-individual spawns where it first appears (frame 1).
    assert len(labels.tracks) == 3
    assert sorted(t.name for t in labels.tracks) == sorted(
        ["Animal1", "Animal2", "single"]
    )
    for t in labels.tracks:
        assert t.spawned_on == (1 if t.name == "single" else 0)


@pytest.mark.parametrize(
    "test_data",
    [
        os.path.join(DLC, "dlc_testdata.csv"),
        os.path.join(DLC, "dlc_testdata_v2.csv"),
    ],
)
def test_sadlc(test_data):
    labels = formats.read(test_data, as_format="deeplabcut")

    assert labels.skeleton.node_names == ["A", "B", "C"]
    assert len(labels) == 3
    assert all(len(lf) == 1 for lf in labels)
    assert len(labels.tracks) == 0

    assert_array_equal(labels[0][0].numpy(), [[0, 1], [2, 3], [4, 5]])
    assert_array_equal(
        labels[1][0].numpy(), [[12, 13], [np.nan, np.nan], [15, 16]]
    )
    assert_array_equal(labels[2][0].numpy(), [[22, 23], [24, 25], [26, 27]])
    assert labels[2].frame_idx == 3


def test_sniff_dlc_config_yaml():
    assert (
        formats.sniff_format(os.path.join(REF, "dlc", "madlc_230_config.yaml"))
        == "dlc_config"
    )
