import numpy as np
import pytest

from sleap_tpu.core.instance import Instance, PredictedInstance, Track
from sleap_tpu.core.labels import Labels
from sleap_tpu.io import slp


def test_read_minimal(minimal_slp):
    labels = Labels.load_file(minimal_slp)
    assert len(labels) == 1
    assert len(labels.skeletons) == 1
    assert labels.skeleton.node_names == ["A", "B"]
    assert labels.skeleton.edge_inds == [(0, 1)]
    lf = labels[0]
    assert lf.frame_idx == 0
    assert len(lf.instances) == 2
    assert all(not inst.predicted for inst in lf.instances)
    pts = lf.instances[0].numpy()
    np.testing.assert_allclose(
        pts, [[92.65220773, 202.72597774], [152.34188116, 158.42364351]], rtol=1e-9
    )


def test_read_predictions_with_tracks(predictions_slp):
    labels = Labels.load_file(predictions_slp)
    assert len(labels.tracks) == 2
    assert {t.name for t in labels.tracks} == {"female", "male"}
    assert len(labels) > 100
    lf = labels[0]
    assert len(lf.predicted_instances) == 2
    inst = lf.predicted_instances[0]
    assert isinstance(inst, PredictedInstance)
    assert inst.score > 0
    assert inst.tracking_score > 0.9
    assert inst.track is not None
    # Per-point scores present.
    assert np.all(inst.scores[inst.points["visible"]] > 0)


def test_roundtrip(minimal_slp, tmp_path):
    labels = Labels.load_file(minimal_slp)
    out = str(tmp_path / "roundtrip.slp")
    labels.save(out)
    labels2 = Labels.load_file(out)
    assert len(labels2) == len(labels)
    assert labels2.skeleton.matches(labels.skeleton)
    np.testing.assert_allclose(labels2[0].numpy(), labels[0].numpy())


def test_roundtrip_predictions(predictions_slp, tmp_path):
    labels = Labels.load_file(predictions_slp)
    out = str(tmp_path / "preds.slp")
    labels.save(out)
    labels2 = Labels.load_file(out)
    assert len(labels2) == len(labels)
    assert len(labels2.tracks) == len(labels.tracks)
    lf_a, lf_b = labels[10], labels2[10]
    np.testing.assert_allclose(lf_a.numpy(), lf_b.numpy(), equal_nan=True)
    for a, b in zip(lf_a.instances, lf_b.instances):
        assert a.track.name == b.track.name
        assert a.score == pytest.approx(b.score, rel=1e-6)
        assert a.tracking_score == pytest.approx(b.tracking_score, rel=1e-6)


def test_reference_can_be_read_by_us_and_vice_versa(minimal_slp, tmp_path):
    """Our output must be structurally identical to the reference layout."""
    import h5py

    labels = Labels.load_file(minimal_slp)
    out = str(tmp_path / "compat.slp")
    labels.save(out)
    with h5py.File(out, "r") as f:
        assert set(f.keys()) >= {
            "frames",
            "instances",
            "metadata",
            "points",
            "pred_points",
            "tracks_json",
            "videos_json",
        }
        assert float(f["metadata"].attrs["format_id"]) == 1.2
        names = f["instances"].dtype.names
        assert "tracking_score" in names


def test_save_with_embedded_images(minimal_slp, tmp_path):
    labels = Labels.load_file(minimal_slp)
    if labels.video.is_missing:
        pytest.skip("source video not available")
    out = str(tmp_path / "package.pkg.slp")
    labels.save(out, with_images=True)
    labels2 = Labels.load_file(out)
    assert len(labels2) == 1
    img = labels2[0].image
    assert img.shape[0] > 0 and img.ndim == 3
    # Embedded video knows its source.
    assert labels2.video.backend.has_embedded_images


def test_build_and_save_from_scratch(tmp_path):
    from sleap_tpu.core.skeleton import Skeleton
    from sleap_tpu.core.instance import LabeledFrame
    from sleap_tpu.io.video import Video

    skel = Skeleton.from_names_and_edge_inds(["a", "b", "c"], [(0, 1), (1, 2)])
    video = Video.from_numpy(np.zeros((4, 16, 16, 1), dtype="uint8"))
    track = Track(0, "animal0")
    lf = LabeledFrame(
        video=video,
        frame_idx=2,
        instances=[
            Instance(skeleton=skel, points=np.array([[1.0, 2.0], [3.0, 4.0], [np.nan, np.nan]])),
            PredictedInstance.from_arrays(
                np.array([[5.0, 6.0], [7.0, 8.0], [9.0, 10.0]]),
                np.array([0.9, 0.8, 0.7]),
                instance_score=0.85,
                skeleton=skel,
                track=track,
            ),
        ],
    )
    labels = Labels(labeled_frames=[lf])
    assert track in labels.tracks
    out = str(tmp_path / "scratch.slp")
    labels.save(out)
    labels2 = Labels.load_file(out)
    lf2 = labels2[0]
    assert lf2.frame_idx == 2
    assert len(lf2.user_instances) == 1
    assert len(lf2.predicted_instances) == 1
    np.testing.assert_allclose(
        lf2.user_instances[0].numpy(),
        [[1.0, 2.0], [3.0, 4.0], [np.nan, np.nan]],
        equal_nan=True,
    )
    pred = lf2.predicted_instances[0]
    assert pred.score == pytest.approx(0.85)
    assert pred.track.name == "animal0"
    np.testing.assert_allclose(pred.scores, [0.9, 0.8, 0.7])


def test_suggestions_roundtrip(tmp_path):
    import numpy as np

    from sleap_tpu.core.instance import Instance, LabeledFrame
    from sleap_tpu.core.labels import Labels, SuggestionFrame
    from sleap_tpu.core.skeleton import Skeleton
    from sleap_tpu.io.video import Video

    sk = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)], name="S")
    video = Video.from_numpy(np.zeros((4, 8, 8, 1), np.uint8))
    labels = Labels(
        labeled_frames=[
            LabeledFrame(video=video, frame_idx=0, instances=[Instance(skeleton=sk)])
        ],
        suggestions=[
            SuggestionFrame(video=video, frame_idx=2, group=0),
            SuggestionFrame(video=video, frame_idx=3, group=1),
        ],
    )
    out = str(tmp_path / "sugg.slp")
    labels.save(out)
    loaded = Labels.load_file(out)
    assert [(s.frame_idx, s.group) for s in loaded.suggestions] == [(2, 0), (3, 1)]
    assert loaded.suggestions[0].video is loaded.videos[0]


def test_provenance_roundtrip(tmp_path):
    import numpy as np

    from sleap_tpu.core.instance import Instance, LabeledFrame
    from sleap_tpu.core.labels import Labels
    from sleap_tpu.core.skeleton import Skeleton
    from sleap_tpu.io.video import Video

    sk = Skeleton.from_names_and_edge_inds(["a"], [], name="S")
    video = Video.from_numpy(np.zeros((1, 8, 8, 1), np.uint8))
    labels = Labels(
        labeled_frames=[
            LabeledFrame(video=video, frame_idx=0, instances=[Instance(skeleton=sk)])
        ],
        provenance={"model_paths": ["m1", "m2"], "sleap_version": "x"},
    )
    out = str(tmp_path / "prov.slp")
    labels.save(out)
    loaded = Labels.load_file(out)
    assert loaded.provenance["model_paths"] == ["m1", "m2"]


def test_multi_video_multi_skeleton_roundtrip(tmp_path):
    import numpy as np

    from sleap_tpu.core.instance import Instance, LabeledFrame, Track
    from sleap_tpu.core.labels import Labels
    from sleap_tpu.core.skeleton import Skeleton
    from sleap_tpu.io.video import Video

    sk1 = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)], name="one")
    sk2 = Skeleton.from_names_and_edge_inds(["x", "y", "z"], [(0, 1), (1, 2)], name="two")
    v1 = Video.from_numpy(np.zeros((2, 8, 8, 1), np.uint8))
    v2 = Video.from_numpy(np.full((3, 6, 6, 1), 7, np.uint8))
    t = Track(spawned_on=1, name="track-1")
    labels = Labels(
        labeled_frames=[
            LabeledFrame(
                video=v1, frame_idx=0,
                instances=[Instance(skeleton=sk1, points=np.array([[1.0, 2.0], [3.0, 4.0]]))],
            ),
            LabeledFrame(
                video=v2, frame_idx=1,
                instances=[
                    Instance(
                        skeleton=sk2,
                        points=np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]),
                        track=t,
                    )
                ],
            ),
        ]
    )
    out = str(tmp_path / "multi.slp")
    labels.save(out)
    loaded = Labels.load_file(out)
    assert len(loaded.videos) == 2
    assert sorted(s.name for s in loaded.skeletons) == ["one", "two"]
    assert loaded.tracks[0].name == "track-1"
    assert loaded.tracks[0].spawned_on == 1
    lf2 = [lf for lf in loaded if lf.video == loaded.videos[1]][0]
    assert lf2.instances[0].skeleton.node_names == ["x", "y", "z"]
    # Second video's embedded shape/content survives.
    assert loaded.videos[1].get_frame(0).max() == 7


def test_read_single_image_video_projects():
    """SIV-format .slp projects (SingleImageVideo backends) load with intact
    instances (reference fixture dirs siv_format_v1/v2)."""
    import os

    from sleap_tpu.core.labels import load_file
    from sleap_tpu.io.video import SingleImageVideo

    for rel in (
        "siv_format_v1/small_robot_siv.slp",
        "siv_format_v2/small_robot_siv_caching.slp",
    ):
        p = os.path.join("/root/reference/tests/data", rel)
        if not os.path.exists(p):
            pytest.skip("reference SIV fixtures unavailable")
        labels = load_file(p)
        assert len(labels) == 3
        assert isinstance(labels.videos[0].backend, SingleImageVideo)
        for lf in labels.labeled_frames:
            assert len(lf.instances) >= 1
            assert np.isfinite(lf.instances[0].numpy()).any()
