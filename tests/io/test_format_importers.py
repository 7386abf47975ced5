"""Ecosystem format importers against the reference's own test fixtures.

Mirrors the reference's tests/io/test_formats.py strategy (SURVEY §4).
"""

import os

import numpy as np
import pytest

from sleap_tpu.io import formats

REF = "/root/reference/tests/data"

needs = lambda p: pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, p)), reason="reference fixture unavailable"
)


@needs("json_format_v2/minimal_instance.json")
def test_import_legacy_json_v2():
    labels = formats.read(os.path.join(REF, "json_format_v2/minimal_instance.json"))
    assert len(labels) == 1
    assert labels.skeletons[0].node_names == ["A", "B"]
    assert len(labels[0].instances) == 2
    pts = labels[0].instances[0].numpy()
    assert np.isfinite(pts).all()


@needs("dlc/labeled-data/video/maudlc_testdata.csv")
def test_import_dlc_multianimal():
    labels = formats.read(
        os.path.join(REF, "dlc/labeled-data/video/maudlc_testdata.csv")
    )
    assert len(labels) > 0
    assert len(labels.skeletons) == 1
    # Multi-animal: several instances appear in at least one frame.
    assert max(len(lf.instances) for lf in labels) >= 2


@needs("dlc/madlc_230_config.yaml")
def test_sniff_dlc_csv():
    p = os.path.join(REF, "dlc/labeled-data/video/madlc_testdata.csv")
    if not os.path.exists(p):
        pytest.skip("fixture unavailable")
    assert formats.sniff_format(p) == "dlc"


@needs("alphatracker/at_testdata.json")
def test_import_alphatracker():
    labels = formats.read(os.path.join(REF, "alphatracker/at_testdata.json"))
    assert len(labels) > 0
    assert all(len(lf.instances) >= 1 for lf in labels)


@needs("mat")
def test_import_leap_mat():
    mats = [f for f in os.listdir(os.path.join(REF, "mat")) if f.endswith(".mat")]
    if not mats:
        pytest.skip("no .mat fixtures")
    labels = formats.read(os.path.join(REF, "mat", mats[0]))
    assert len(labels) > 0


@needs("hdf5_format_v1/centered_pair_predictions.h5")
def test_import_analysis_h5_roundtrip(tmp_path):
    # Export one of our own labels to analysis h5, then re-import it.
    import sleap_tpu
    from sleap_tpu.info.write_tracking_h5 import export_analysis_file

    src = os.path.join(REF, "tracks/clip.predictions.slp")
    if not os.path.exists(src):
        pytest.skip("fixture unavailable")
    labels = sleap_tpu.load_file(src)
    out = str(tmp_path / "out.analysis.h5")
    export_analysis_file(labels, out, labels_path=src, all_frames=False)
    re = formats.read(out)
    assert len(re) > 0
    assert len(re.tracks) == len(labels.tracks)
