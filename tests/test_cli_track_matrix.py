"""sleap-track CLI path-handling matrix.

Port of /root/reference/tests/nn/test_inference.py:1546-1961: single/multi
inputs, directory inputs, csv/txt list files, output-path rules, and invalid
input/output errors — run against the real reference fixture models end to
end (predict + save), on CPU.
"""

import csv
import os
import shutil
from pathlib import Path

import pytest

MODELS = "/root/reference/tests/data/models"
VIDEO = "/root/reference/tests/data/videos/centered_pair_small.mp4"


def _require(path):
    if not os.path.exists(path):
        pytest.skip(f"reference fixture unavailable: {path}")
    return path


@pytest.fixture
def model_args():
    centroid = _require(os.path.join(MODELS, "minimal_instance.UNet.centroid"))
    instance = _require(
        os.path.join(MODELS, "minimal_instance.UNet.centered_instance")
    )
    return ["-m", centroid, "-m", instance]


@pytest.fixture
def preds_slp(tmp_path):
    """A predictions .slp whose video resolves (fixture re-saved to tmp),
    trimmed to 20 frames so flow retracking stays fast on CPU."""
    import sleap_tpu
    from sleap_tpu.core.labels import Labels

    src = _require("/root/reference/tests/data/tracks/clip.predictions.slp")
    labels = sleap_tpu.load_file(src)
    frames = sorted(labels.labeled_frames, key=lambda lf: lf.frame_idx)[:20]
    out = str(tmp_path / "old_slp.slp")
    Labels(labeled_frames=frames).save(out)
    return out


def _track(args):
    from sleap_tpu.cli.track import main

    main(args)


@pytest.mark.slow
def test_sleap_track_single_input(preds_slp, model_args, tmp_path):
    # Reference :1546 — slp input, predictions land NEXT to it with the
    # .predictions.slp suffix REPLACING the extension (with_suffix rule).
    _track(
        [preds_slp, *model_args, "--video.index", "0", "--frames", "1-3",
         "--cpu", "--verbosity", "none"]
    )
    out = Path(preds_slp).with_suffix(".predictions.slp")
    assert out.exists()

    # Missing models AND missing tracker -> ValueError (reference :1568).
    with pytest.raises(ValueError):
        _track([preds_slp, "--cpu"])


@pytest.mark.slow
def test_sleap_track_mult_input_slp(preds_slp, model_args, tmp_path):
    # Reference :1575 — a directory of multiple .slp files: slp inputs are
    # SKIPPED when there is more than one input (printed, not an error).
    d = tmp_path / "slp_directory"
    d.mkdir()
    for i in range(3):
        shutil.copy(preds_slp, d / f"old_slp_copy_{i}.slp")
    _track(
        [str(d), *model_args, "--tracking.tracker", "simple",
         "--video.index", "0", "--frames", "1-3", "--cpu",
         "--verbosity", "none"]
    )
    assert not list(d.glob("*.predictions.slp"))


@pytest.mark.slow
@pytest.mark.parametrize("tracking", ["simple", "flow"])
def test_sleap_track_mult_input_slp_mp4(preds_slp, model_args, tmp_path, tracking):
    # Reference :1619 — mixed dir: every VIDEO gets its own predictions
    # file; the .slp is skipped.
    _require(VIDEO)
    d = tmp_path / "slp_mp4_directory"
    d.mkdir()
    shutil.copy(preds_slp, d / "old_slp.slp")
    for i in range(2):
        shutil.copy(VIDEO, d / f"vid_copy_{i}.mp4")
    _track(
        [str(d), *model_args, "--tracking.tracker", tracking,
         "--video.index", "0", "--frames", "1-3", "--cpu",
         "--verbosity", "none"]
    )
    for i in range(2):
        assert (d / f"vid_copy_{i}.predictions.slp").exists()
    assert not (d / "old_slp.predictions.slp").exists()


@pytest.mark.slow
def test_sleap_track_mult_input_mp4(model_args, tmp_path):
    # Reference :1663 — directory of videos only.
    _require(VIDEO)
    d = tmp_path / "mp4_directory"
    d.mkdir()
    for i in range(3):
        shutil.copy(VIDEO, d / f"vid_copy_{i}.mp4")
    _track(
        [str(d), *model_args, "--frames", "1-3", "--cpu",
         "--verbosity", "none"]
    )
    for i in range(3):
        assert (d / f"vid_copy_{i}.predictions.slp").exists()


@pytest.mark.slow
def test_sleap_track_output_mult(model_args, tmp_path):
    # Reference :1704 — -o names a DIRECTORY when multiple inputs are given;
    # outputs are <stem>.predictions.slp inside it.
    _require(VIDEO)
    d = tmp_path / "mp4_directory"
    d.mkdir()
    outdir = tmp_path / "output_directory"
    outdir.mkdir()
    for i in range(2):
        shutil.copy(VIDEO, d / f"vid_copy_{i}.mp4")
    _track(
        [str(d), *model_args, "-o", str(outdir), "--frames", "1-3",
         "--cpu", "--verbosity", "none"]
    )
    for i in range(2):
        assert (outdir / f"vid_copy_{i}.predictions.slp").exists()


def test_sleap_track_invalid_output(preds_slp, model_args, tmp_path):
    # Reference :1751 — -o pointing at an existing FILE with multiple
    # inputs is a ValueError before any inference runs.
    _require(VIDEO)
    d = tmp_path / "mp4_directory"
    d.mkdir()
    for i in range(2):
        shutil.copy(VIDEO, d / f"vid_copy_{i}.mp4")
    with pytest.raises(ValueError):
        _track(
            [str(d), *model_args, "-o", preds_slp, "--frames", "1-3",
             "--cpu", "--verbosity", "none"]
        )


def test_sleap_track_invalid_input(model_args):
    # Reference :1785 — empty and nonexistent data paths are ValueErrors.
    with pytest.raises(ValueError):
        _track(["", *model_args, "--cpu"])
    with pytest.raises(ValueError):
        _track(["/path/to/nonexistent/file.mp4", *model_args, "--cpu"])


@pytest.mark.slow
def test_sleap_track_csv_input(model_args, tmp_path):
    # Reference :1818 — csv with data_path + output_path columns; outputs
    # use the per-row names.
    _require(VIDEO)
    d = tmp_path / "mp4_directory"
    d.mkdir()
    rows = []
    for i in range(2):
        p = d / f"vid_copy_{i}.mp4"
        shutil.copy(VIDEO, p)
        rows.append((str(p), str(p.with_suffix(".TESTpredictions.slp"))))
    csv_path = d / "file_paths.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["data_path", "output_path"])
        w.writerows(rows)
    _track(
        [str(csv_path), *model_args, "--frames", "1-3", "--cpu",
         "--verbosity", "none"]
    )
    for _, out in rows:
        assert Path(out).exists()


def test_sleap_track_invalid_csv(model_args, tmp_path):
    # Reference :1873 — csv of nonexistent files (no valid data column) and
    # an empty csv both raise ValueError.
    bad = tmp_path / "nonexistent_files.csv"
    with open(bad, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["data_path"])
        for i in range(3):
            w.writerow([f"video{i}.mp4"])
    with pytest.raises(ValueError):
        _track([str(bad), *model_args, "--cpu"])

    empty = tmp_path / "empty.csv"
    empty.touch()
    with pytest.raises(ValueError):
        _track([str(empty), *model_args, "--cpu"])


@pytest.mark.slow
def test_sleap_track_text_file_input(model_args, tmp_path):
    # Reference :1915 — .txt with one path per line.
    _require(VIDEO)
    d = tmp_path / "mp4_directory"
    d.mkdir()
    paths = []
    for i in range(2):
        p = d / f"vid_copy_{i}.mp4"
        shutil.copy(VIDEO, p)
        paths.append(p)
    txt = d / "file_paths.txt"
    txt.write_text("".join(f"{p}\n" for p in paths))
    _track(
        [str(txt), *model_args, "--frames", "1-3", "--cpu",
         "--verbosity", "none"]
    )
    for p in paths:
        assert p.with_suffix(".predictions.slp").exists()


@pytest.mark.slow
@pytest.mark.parametrize("tracker_method", ["simple", "flow", "simplemaxtracks",
                                            "flowmaxtracks"])
@pytest.mark.parametrize("output_path", [None, "not_default"])
def test_retracking_via_sleap_track(preds_slp, tmp_path, tracker_method,
                                    output_path):
    # Reference :1418 — retracking an existing predictions file through the
    # sleap-track CLI across tracker methods and output naming.
    import sleap_tpu
    from sleap_tpu.cli.track import make_parser, make_tracker_from_cli

    cmd = (
        f"{preds_slp} --tracking.tracker {tracker_method} "
        "--tracking.similarity object_keypoint --cpu --verbosity none"
    )
    if tracker_method == "flow":
        cmd += " --tracking.save_shifted_instances 1"
    elif tracker_method in ("simplemaxtracks", "flowmaxtracks"):
        cmd += " --tracking.max_tracking 1 --tracking.max_tracks 2"
    if output_path == "not_default":
        output_path = str(tmp_path / f"tracked_{tracker_method}.slp")
        cmd += f" --output {output_path}"
    args = cmd.split()
    _track(args)

    if output_path is None:
        ns = make_parser().parse_args(args)
        tracker = make_tracker_from_cli(ns)
        assert (
            tracker.similarity_function.__name__ == "object_keypoint_similarity"
        )
        output_path = f"{preds_slp}.{tracker.get_name()}.slp"
    assert os.path.exists(output_path)
    new_labels = sleap_tpu.load_file(output_path)
    assert any(
        inst.track is not None
        for lf in new_labels.labeled_frames
        for inst in lf.predicted_instances
    )


@pytest.mark.slow
def test_sleap_track_tracking_only_mode(preds_slp, tmp_path):
    # Reference :5712 — no models + --tracking.tracker retracks an existing
    # predictions file; default output is <input>.<tracker>.slp.
    _track(
        [preds_slp, "--tracking.tracker", "simple", "--cpu",
         "--verbosity", "none"]
    )
    import sleap_tpu

    out = preds_slp + ".simpletracker.slp"
    if not os.path.exists(out):
        # get_name() naming may differ; find the produced file.
        cands = [
            p for p in os.listdir(os.path.dirname(preds_slp))
            if p.startswith(os.path.basename(preds_slp) + ".") and p.endswith(".slp")
        ]
        assert cands, "tracking-only mode produced no output"
        out = os.path.join(os.path.dirname(preds_slp), cands[0])
    labels = sleap_tpu.load_file(out)
    assert len(labels) > 0
    assert any(
        inst.track is not None
        for lf in labels.labeled_frames
        for inst in lf.predicted_instances
    )
