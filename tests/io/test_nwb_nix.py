"""NWB / NIX adaptor tests.

pynwb/ndx-pose/nixio are not installed in this image, so the file-format
round trips are gated; everything dependency-free — the Labels<->array
conversion logic both adaptors are built on — is tested here, plus the
import gates themselves.
"""

import numpy as np
import pytest

from sleap_tpu.core.instance import (
    Instance,
    LabeledFrame,
    PredictedInstance,
    Track,
)
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.formats.ndx_pose import (
    labels_to_pose_arrays,
    tracks_numpy_to_labeled_frames,
)
from sleap_tpu.io.formats.nix import assemble_nix_arrays, _check_video
from sleap_tpu.io.video import Video


@pytest.fixture
def tracked_labels():
    skel = Skeleton.from_names_and_edge_inds(["a", "b", "c"], [(0, 1), (1, 2)], name="S")
    video = Video.from_numpy(np.zeros((4, 32, 32, 1), np.uint8))
    t0, t1 = Track(0, "t0"), Track(0, "t1")
    lfs = []
    for i in range(3):
        insts = [
            PredictedInstance.from_arrays(
                points=np.full((3, 2), 10.0 + i),
                point_confidences=np.full(3, 0.9),
                instance_score=0.9,
                skeleton=skel,
                track=t0,
            ),
            PredictedInstance.from_arrays(
                points=np.full((3, 2), 20.0 + i),
                point_confidences=np.full(3, 0.8),
                instance_score=0.8,
                skeleton=skel,
                track=t1,
            ),
        ]
        lfs.append(LabeledFrame(video=video, frame_idx=i, instances=insts))
    return Labels(lfs)


def test_labels_numpy_return_confidence(tracked_labels):
    # all_frames=True spans the full 4-frame video (reference semantics).
    arr = tracked_labels.numpy(return_confidence=True)
    assert arr.shape == (4, 2, 3, 3)
    np.testing.assert_allclose(arr[0, 0, :, 2], 0.9)
    np.testing.assert_allclose(arr[1, 1, :, :2], 21.0)


def test_pose_arrays_roundtrip(tracked_labels):
    video = tracked_labels.video
    skel = tracked_labels.skeleton
    tracks_numpy, untracked = labels_to_pose_arrays(tracked_labels, video)
    assert not untracked
    lfs = tracks_numpy_to_labeled_frames(
        tracks_numpy[..., :2], tracks_numpy[..., 2], not untracked, video, skel
    )
    assert len(lfs) == 3
    orig = tracked_labels.numpy()
    rt = Labels(lfs).numpy()
    np.testing.assert_allclose(rt, orig, equal_nan=True)
    # tracked flag preserved: instances carry tracks
    assert all(inst.track is not None for lf in lfs for inst in lf.instances)


def test_pose_arrays_untracked():
    skel = Skeleton.from_names_and_edge_inds(["a"], [], name="S")
    video = Video.from_numpy(np.zeros((2, 16, 16, 1), np.uint8))
    lfs = [
        LabeledFrame(
            video=video, frame_idx=0,
            instances=[
                PredictedInstance.from_arrays(
                    points=np.array([[1.0, 2.0]]),
                    point_confidences=np.array([0.5]),
                    instance_score=0.5, skeleton=skel,
                )
            ],
        )
    ]
    labels = Labels(lfs)
    arr, untracked = labels_to_pose_arrays(labels, video)
    assert untracked
    assert arr.shape == (2, 1, 1, 3)  # full 2-frame video span
    out = tracks_numpy_to_labeled_frames(arr[..., :2], arr[..., 2], False, video, skel)
    assert out[0].instances[0].track is None


def test_nix_assembly(tracked_labels):
    video = tracked_labels.video
    data = assemble_nix_arrays(tracked_labels, video)
    arrays, maps = data["arrays"], data["maps"]
    assert data["n_instances"] == 6
    np.testing.assert_array_equal(arrays["frame"], [0, 0, 1, 1, 2, 2])
    np.testing.assert_array_equal(arrays["track"], [0, 1, 0, 1, 0, 1])
    assert arrays["position"].shape == (6, 2, 3)
    np.testing.assert_allclose(arrays["position"][0, :, 0], [10.0, 10.0])
    np.testing.assert_allclose(arrays["centroid"][1], [20.0, 20.0])
    np.testing.assert_allclose(arrays["node_score"][0], 0.9)
    assert maps["track_map"][0] == ("none", -1, -1)
    assert ("t0", 0, 0) in maps["track_map"]
    assert len(maps["node_map"]) == 3


def test_nix_check_video_errors(tracked_labels):
    other = Video.from_numpy(np.zeros((2, 8, 8, 1), np.uint8))
    with pytest.raises(ValueError, match="not part of this project"):
        _check_video(tracked_labels, other)
    with pytest.raises(ValueError, match="no videos"):
        _check_video(Labels([]), None)


def test_import_gates(tracked_labels, tmp_path):
    """With pynwb/nixio absent, writers raise ImportError (not NotImplemented):
    the logic exists, only the dependency import is gated."""
    pytest.importorskip_absent = None
    try:
        import pynwb  # noqa: F401

        has_pynwb = True
    except ImportError:
        has_pynwb = False
    try:
        import nixio  # noqa: F401

        has_nixio = True
    except ImportError:
        has_nixio = False

    if not has_pynwb:
        with pytest.raises(ImportError, match="pynwb"):
            tracked_labels.export_nwb(str(tmp_path / "out.nwb"))
    else:
        tracked_labels.export_nwb(str(tmp_path / "out.nwb"))
        from sleap_tpu.io.formats.ndx_pose import read_labels

        rt = read_labels(str(tmp_path / "out.nwb"))
        np.testing.assert_allclose(
            rt.numpy(), tracked_labels.numpy(), equal_nan=True, atol=1e-4
        )

    if not has_nixio:
        with pytest.raises(ImportError, match="nixio"):
            tracked_labels.export_nix(str(tmp_path / "out.nix"))
    else:
        tracked_labels.export_nix(str(tmp_path / "out.nix"))
