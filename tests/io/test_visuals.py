"""sleap-render correctness beyond roundtrip.

Port of /root/reference/tests/io/test_visuals.py: resize sizing rule, marked
pixels actually change (and unmarked ones don't), solid-background rendering
verified by mean frame color, and instance-crop output sizes.
"""

import os

import numpy as np
import pytest

from sleap_tpu.io import visuals


@pytest.fixture
def preds_labels(centered_pair_predictions_slp):
    import sleap_tpu

    return sleap_tpu.load_file(centered_pair_predictions_slp)


def test_resize_images(centered_pair_video):
    from sleap_tpu.io.video import Video

    video = Video.from_filename(centered_pair_video, grayscale=True)
    imgs = np.stack([video.get_frame(i) for i in range(4)])
    resized = visuals.resize_images(imgs, 0.25)
    # Reference rule (visuals.py:620): int-truncated sizing, channel kept.
    assert resized.shape[0] == imgs.shape[0]
    assert resized.shape[1] == imgs.shape[1] // 4
    assert resized.shape[2] == imgs.shape[2] // 4
    assert resized.shape[3] == imgs.shape[3]


def test_render_marks_pixels(preds_labels):
    # Reference test_serial_pipeline: pixels near a point change, pixels far
    # from any instance stay identical.
    video = preds_labels.videos[0]
    lf = preds_labels.labeled_frames[0]
    img = video.get_frame(lf.frame_idx)
    small = visuals.resize_images(np.stack([img]), 0.25)[0]
    marked = visuals.render_frame(
        preds_labels, small.copy(), lf.frame_idx, video=video, scale=0.25
    )
    pts = np.concatenate([inst.numpy() for inst in lf.instances]) * 0.25
    pts = pts[np.isfinite(pts).all(axis=1)]
    x, y = int(round(pts[0, 0])), int(round(pts[0, 1]))
    assert not np.allclose(
        marked[y - 2 : y + 2, x - 2 : x + 2, 0],
        small[y - 2 : y + 2, x - 2 : x + 2, 0],
    )
    # A corner far from every instance is untouched.
    dists = np.linalg.norm(pts - np.array([[2.0, 2.0]]), axis=1)
    assert dists.min() > 10, "fixture instances unexpectedly near the corner"
    assert np.allclose(marked[:4, :4, 0], small[:4, :4, 0])


@pytest.mark.parametrize("background", ["original", "black", "white", "grey"])
def test_render_backgrounds(preds_labels, tmp_path, background):
    # Reference test_sleap_render_with_different_backgrounds.
    out = str(tmp_path / f"test_{background}.mp4")
    video = preds_labels.videos[0]
    frames = [lf.frame_idx for lf in preds_labels.labeled_frames[:2]]
    visuals.save_labeled_video(
        out, preds_labels, video=video, frames=frames, scale=1.0,
        background=background,
    )
    assert os.path.exists(out) and os.path.getsize(out) > 0
    if background != "original":
        from sleap_tpu.io.video import Video

        rendered = Video.from_filename(out)
        frame = rendered.get_frame(0).astype(np.float64)
        mean = frame.mean()
        if background == "white":
            assert mean > 240
        elif background == "black":
            assert mean < 40
        else:
            assert 40 <= mean <= 240


def test_invalid_background_rejected(preds_labels, tmp_path):
    with pytest.raises(ValueError, match="Invalid background color"):
        visuals.save_labeled_video(
            str(tmp_path / "x.mp4"), preds_labels,
            frames=[preds_labels.labeled_frames[0].frame_idx],
            background="plaid",
        )


@pytest.mark.parametrize("crop", ["Half", "Quarter", None])
def test_write_visuals_crop(preds_labels, tmp_path, crop):
    # Reference test_write_visuals: crop_size_xy controls output frame size.
    video = preds_labels.videos[0]
    w, h = int(video.width), int(video.height)
    crop_size_xy = None
    if crop == "Half":
        crop_size_xy = (w // 2, h // 2)
    elif crop == "Quarter":
        crop_size_xy = (w // 4, h // 4)
    out = str(tmp_path / "clip.mp4")
    frames = [lf.frame_idx for lf in preds_labels.labeled_frames[:3]]
    visuals.save_labeled_video(
        out, preds_labels, video=video, frames=frames, fps=15,
        scale=1.0, crop_size_xy=crop_size_xy,
    )
    assert os.path.exists(out)
    from sleap_tpu.io.video import Video

    rendered = Video.from_filename(out)
    want_w, want_h = crop_size_xy if crop_size_xy else (w, h)
    assert (int(rendered.width), int(rendered.height)) == (want_w, want_h)


def test_sleap_render_cli(preds_labels, centered_pair_predictions_slp, tmp_path):
    # Reference test_sleap_render: the CLI end to end with crop+background.
    out = str(tmp_path / "testvis.mp4")
    visuals.main(
        [
            centered_pair_predictions_slp,
            "-o", out, "-f", "2", "--scale", "0.5", "--frames", "1,2",
            "--video-index", "0", "--background", "grey", "--crop", "96,96",
        ]
    )
    assert os.path.exists(out) and os.path.getsize(out) > 0

def test_pipelined_matches_serial(preds_labels, tmp_path):
    """The reader->marker->writer pipeline writes the same frames in the
    same order as the serial path (including the stateful crop smoothing)."""
    frames = sorted(lf.frame_idx for lf in preds_labels.labeled_frames)[:40]

    def render(pipelined, name):
        out = tmp_path / name
        visuals.save_labeled_video(
            str(out), preds_labels, frames=frames, scale=0.5,
            crop_size_xy=(96, 96), pipelined=pipelined,
        )
        from sleap_tpu.io.video import Video

        v = Video.from_filename(str(out))
        arr = np.stack([v.get_frame(i) for i in range(v.num_frames)])
        return arr

    a = render(False, "serial.avi")
    b = render(True, "pipelined.avi")
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_pipelined_overlaps_stages(preds_labels, monkeypatch, tmp_path):
    """Structural throughput check: with decode and encode each sleeping
    (GIL-released, like real cv2 IO), the pipeline must overlap them —
    serial time ~ frames*(decode+encode), pipelined ~ frames*max(...).
    Sleep-based so it holds on the single-core CI."""
    import time

    from sleap_tpu.io import videowriter

    video = preds_labels.videos[0]
    all_frames = sorted(lf.frame_idx for lf in preds_labels.labeled_frames)
    frames = (all_frames * 3)[:60]
    img = video.get_frame(frames[0])
    delay = 0.008
    # Fine-grained chunks so the pipeline fill/drain tail is small relative
    # to the 60-frame run.
    monkeypatch.setattr(visuals, "_RENDER_CHUNK", 4)

    class SlowVideo:
        height, width = video.height, video.width

        def get_frame(self, fi):
            time.sleep(delay)
            return img

    class SlowWriter:
        def __init__(self):
            self.n = 0

        def add_frame(self, f, bgr=True):
            time.sleep(delay)
            self.n += 1

        def close(self):
            pass

    writers = []

    def fake_builder(*a, **k):
        w = SlowWriter()
        writers.append(w)
        return w

    monkeypatch.setattr(
        videowriter.VideoWriter, "safe_builder", staticmethod(fake_builder)
    )
    monkeypatch.setattr(
        visuals.VideoWriter, "safe_builder", staticmethod(fake_builder)
    )

    def run(pipelined):
        t0 = time.perf_counter()
        visuals.save_labeled_video(
            str(tmp_path / "x.avi"), preds_labels, video=SlowVideo(),
            frames=frames, pipelined=pipelined,
        )
        return time.perf_counter() - t0

    t_serial = run(False)
    t_pipe = run(True)
    assert writers[0].n == len(frames) and writers[1].n == len(frames)
    # Ideal ratio is 2.0 (two equal sleeping stages); require a solid margin
    # over no-overlap while absorbing scheduler noise.
    assert t_pipe < 0.75 * t_serial, (t_serial, t_pipe)


def test_pipelined_propagates_errors(preds_labels, tmp_path, monkeypatch):
    video = preds_labels.videos[0]
    frames = sorted(lf.frame_idx for lf in preds_labels.labeled_frames)[:8]

    def boom(fi, img):
        raise RuntimeError("marker failure")

    # Patch render_frame (inside the mark closure) to fail.
    monkeypatch.setattr(visuals, "render_frame", lambda *a, **k: boom(None, None))
    with pytest.raises(RuntimeError, match="marker failure"):
        visuals.save_labeled_video(
            str(tmp_path / "err.avi"), preds_labels, video=video,
            frames=frames, pipelined=True,
        )
