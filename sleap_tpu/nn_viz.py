"""Matplotlib visualization helpers for model outputs.

Rebuild of ``/root/reference/sleap/nn/viz.py:14-305``: confidence map / PAF /
peak / instance plotting and skeleton preview images, used by training
visualizations and notebooks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def imgfig(size: float = 6, dpi: int = 72, scale: float = 1.0):
    import matplotlib.pyplot as plt

    if not isinstance(size, (tuple, list)):
        size = (size, size)
    fig = plt.figure(figsize=(scale * size[0], scale * size[1]), dpi=dpi)
    ax = fig.add_axes([0, 0, 1, 1], frameon=False)
    ax.set_axis_off()
    return fig


def plot_img(img: np.ndarray, dpi: int = 72, scale: float = 1.0):
    """Plot an image in a borderless figure (reference viz.py:14)."""
    import matplotlib.pyplot as plt

    img = np.squeeze(np.asarray(img))
    fig = imgfig(
        size=float(max(img.shape[:2])) / dpi, dpi=dpi, scale=scale
    )
    ax = fig.axes[0]
    ax.imshow(
        img,
        cmap="gray" if img.ndim == 2 else None,
        origin="upper",
        extent=[-0.5, img.shape[1] - 0.5, img.shape[0] - 0.5, -0.5],
    )
    return fig


def plot_confmaps(confmaps: np.ndarray, output_scale: float = 1.0) -> None:
    """Overlay per-channel confidence maps in color (reference viz.py:66)."""
    import matplotlib.pyplot as plt

    ax = plt.gca()
    H, W, n = confmaps.shape
    colors = plt.cm.tab10(np.linspace(0, 1, max(n, 2)))
    composite = np.zeros((H, W, 4))
    for c in range(n):
        alpha = np.clip(confmaps[..., c], 0, 1)
        for k in range(3):
            composite[..., k] = np.maximum(composite[..., k], colors[c, k] * alpha)
        composite[..., 3] = np.maximum(composite[..., 3], alpha * 0.7)
    ax.imshow(
        composite,
        origin="upper",
        extent=[
            -0.5,
            W / output_scale - 0.5,
            H / output_scale - 0.5,
            -0.5,
        ],
    )


def plot_peaks(
    pts_gt: Optional[np.ndarray] = None,
    pts_pr: Optional[np.ndarray] = None,
    paired: bool = False,
) -> None:
    """Scatter GT vs predicted peaks (reference viz.py:137)."""
    import matplotlib.pyplot as plt

    ax = plt.gca()
    if paired and pts_gt is not None and pts_pr is not None:
        for p1, p2 in zip(pts_gt.reshape(-1, 2), pts_pr.reshape(-1, 2)):
            ax.plot([p1[0], p2[0]], [p1[1], p2[1]], "r-", alpha=0.5, lw=1)
    if pts_gt is not None:
        pts = pts_gt.reshape(-1, 2)
        ax.plot(pts[:, 0], pts[:, 1], "g.", ms=8, label="GT")
    if pts_pr is not None:
        pts = pts_pr.reshape(-1, 2)
        ax.plot(pts[:, 0], pts[:, 1], "rx", ms=6, label="Predicted")


def plot_pafs(
    pafs: np.ndarray, output_scale: float = 1.0, stride: int = 4, scale: float = 4.0
) -> None:
    """Quiver plot of part affinity fields (reference viz.py:182)."""
    import matplotlib.pyplot as plt

    ax = plt.gca()
    H, W = pafs.shape[:2]
    paf = pafs.reshape(H, W, -1, 2)
    yy, xx = np.mgrid[0:H:stride, 0:W:stride]
    for e in range(paf.shape[2]):
        u = paf[::stride, ::stride, e, 0]
        v = paf[::stride, ::stride, e, 1]
        ax.quiver(
            xx / output_scale, yy / output_scale, u, -v,
            angles="xy", scale_units="xy", scale=1.0 / scale, width=0.002,
        )


def plot_instance(
    instance, skeleton=None, cmap=None, color_by_node: bool = False, **kwargs
) -> None:
    """Draw one instance's skeleton (reference viz.py:228)."""
    import matplotlib.pyplot as plt

    ax = plt.gca()
    pts = instance.numpy() if hasattr(instance, "numpy") else np.asarray(instance)
    skeleton = skeleton or getattr(instance, "skeleton", None)
    if skeleton is not None:
        for src, dst in skeleton.edge_inds:
            p1, p2 = pts[src], pts[dst]
            if np.isnan(p1).any() or np.isnan(p2).any():
                continue
            ax.plot([p1[0], p2[0]], [p1[1], p2[1]], "-", lw=2, **kwargs)
    ax.plot(pts[:, 0], pts[:, 1], ".", ms=8, **kwargs)


def plot_instances(instances, **kwargs) -> None:
    for inst in instances:
        plot_instance(inst, **kwargs)


def generate_skeleton_preview_image(instance, box_size: int = 128) -> bytes:
    """Render a small PNG preview of a skeleton pose (reference viz.py:281)."""
    import io

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(2, 2), dpi=box_size // 2)
    ax = fig.add_axes([0, 0, 1, 1], frameon=False)
    ax.set_axis_off()
    plot_instance(instance)
    ax.invert_yaxis()
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    return buf.getvalue()
