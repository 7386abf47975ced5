"""``sleap-render``: draw tracked instances onto video frames.

Rebuild of ``/root/reference/sleap/io/visuals.py`` (:30-769): renders
skeleton overlays (edges + nodes colored by track) into an output mp4 using
OpenCV drawing on decoded frames.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Tuple

import numpy as np

from sleap_tpu.core.labels import Labels
from sleap_tpu.io.videowriter import VideoWriter

logger = logging.getLogger(__name__)

# Default track palette (BGR), mirroring the reference's "standard" colors.
_PALETTE = [
    (0, 0, 255),
    (255, 0, 0),
    (0, 255, 0),
    (0, 255, 255),
    (255, 0, 255),
    (255, 255, 0),
    (128, 0, 255),
    (0, 128, 255),
]


def _color_for(labels: Labels, inst, fallback_idx: int) -> Tuple[int, int, int]:
    if inst.track is not None and inst.track in labels.tracks:
        return _PALETTE[labels.tracks.index(inst.track) % len(_PALETTE)]
    return _PALETTE[fallback_idx % len(_PALETTE)]


def render_frame(
    labels: Labels, img: np.ndarray, frame_idx: int, video=None,
    marker_size: int = 4, line_width: int = 2, scale: float = 1.0,
) -> np.ndarray:
    """Draw one frame's instances on an image (BGR uint8)."""
    import cv2

    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = cv2.cvtColor(img[..., 0], cv2.COLOR_GRAY2BGR)
    img = np.ascontiguousarray(img)
    video = video or labels.video
    lf = labels.find_first(video, frame_idx)
    if lf is None:
        return img
    for k, inst in enumerate(lf.instances):
        color = _color_for(labels, inst, k)
        pts = inst.numpy() * scale
        for src, dst in inst.skeleton.edge_inds:
            p1, p2 = pts[src], pts[dst]
            if np.isnan(p1).any() or np.isnan(p2).any():
                continue
            cv2.line(
                img,
                (int(round(p1[0])), int(round(p1[1]))),
                (int(round(p2[0])), int(round(p2[1]))),
                color,
                line_width,
            )
        for p in pts:
            if np.isnan(p).any():
                continue
            cv2.circle(
                img, (int(round(p[0])), int(round(p[1]))), marker_size, color, -1
            )
    return img


def save_labeled_video(
    filename: str,
    labels: Labels,
    video=None,
    frames: Optional[List[int]] = None,
    fps: float = 15.0,
    scale: float = 1.0,
    marker_size: int = 4,
    show_edges: bool = True,
) -> None:
    """Render an annotated video (reference visuals.py:510 ``save_labeled_video``)."""
    import cv2

    video = video or labels.video
    if frames is None:
        frames = sorted(lf.frame_idx for lf in labels.find(video))
    if not frames:
        raise ValueError("No frames to render.")
    h = int(video.height * scale)
    w = int(video.width * scale)
    writer = VideoWriter.safe_builder(filename, height=h, width=w, fps=fps)
    for fi in frames:
        try:
            img = video.get_frame(fi)
        except Exception:
            continue
        if scale != 1.0:
            img = cv2.resize(img, (w, h))
            if img.ndim == 2:
                img = img[..., None]
        out = render_frame(
            labels, img, fi, video=video, marker_size=marker_size, scale=scale
        )
        writer.add_frame(out, bgr=True)
    writer.close()
    logger.info("Saved rendered video: %s", filename)


def main(args=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description="Render annotated video.")
    parser.add_argument("data_path", help="Path to labels (.slp).")
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("-f", "--fps", type=float, default=15.0)
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--frames", default="", help="e.g. 0-100 or 3,5,7")
    parser.add_argument("--video-index", type=int, default=0)
    parser.add_argument("--marker_size", type=int, default=4)
    ns = parser.parse_args(args)

    labels = Labels.load_file(ns.data_path)
    frames = None
    if ns.frames:
        frames = []
        for part in ns.frames.split(","):
            if "-" in part:
                a, b = part.split("-")
                frames.extend(range(int(a), int(b) + 1))
            elif part:
                frames.append(int(part))
    out = ns.output or (ns.data_path + ".avi.mp4")
    save_labeled_video(
        out,
        labels,
        video=labels.videos[ns.video_index],
        frames=frames,
        fps=ns.fps,
        scale=ns.scale,
        marker_size=ns.marker_size,
    )
    print(f"Saved: {out}")


if __name__ == "__main__":
    main()
