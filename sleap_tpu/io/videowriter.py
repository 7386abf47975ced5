"""Video writing for rendering.

Rebuild of ``/root/reference/sleap/io/videowriter.py`` (``VideoWriter:18``
with OpenCV and imageio backends).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class VideoWriter:
    """Factory facade: picks the best available backend."""

    @staticmethod
    def safe_builder(filename: str, height: int, width: int, fps: float = 30.0):
        try:
            return VideoWriterImageio(filename, height, width, fps)
        except Exception:
            return VideoWriterOpenCV(filename, height, width, fps)


class VideoWriterOpenCV:
    def __init__(self, filename: str, height: int, width: int, fps: float = 30.0):
        import cv2

        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self._writer = cv2.VideoWriter(filename, fourcc, fps, (width, height))

    def add_frame(self, img: np.ndarray, bgr: bool = False) -> None:
        import cv2

        if img.ndim == 3 and img.shape[-1] == 1:
            img = cv2.cvtColor(img[..., 0], cv2.COLOR_GRAY2BGR)
        elif img.ndim == 2:
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        elif not bgr:
            img = img[..., ::-1]
        self._writer.write(np.ascontiguousarray(img, dtype=np.uint8))

    def close(self) -> None:
        self._writer.release()


class VideoWriterImageio:
    def __init__(self, filename: str, height: int, width: int, fps: float = 30.0):
        import imageio

        self._writer = imageio.get_writer(filename, fps=fps)

    def add_frame(self, img: np.ndarray, bgr: bool = False) -> None:
        if img.ndim == 3 and img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        elif img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        elif bgr:
            img = img[..., ::-1]
        self._writer.append_data(img.astype(np.uint8))

    def close(self) -> None:
        self._writer.close()
