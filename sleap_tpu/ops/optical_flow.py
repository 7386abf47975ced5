"""Batched pyramidal Lucas-Kanade optical flow (JAX, on-chip).

Replaces the reference flow-shift tracker's per-frame host OpenCV call
(``cv2.calcOpticalFlowPyrLK`` at ``/root/reference/sleap/nn/tracking.py:320``)
— the BASELINE "north star" requires cross-frame instance matching to run as
a batched JAX op. Same algorithm family as OpenCV: Gaussian image pyramid,
per-keypoint window gradients, iterative Newton updates propagated
coarse-to-fine.

TPU-native formulation: bilinear window sampling is NOT a gather. For each
point, the row/column interpolation weights form hat functions
``max(0, 1 - |y - r|)`` over the image rows/cols, so a (window, window)
bilinear patch is exactly ``Wy @ img @ Wx^T`` with dense-but-tiny weight
matrices — two small matmuls that run on the MXU. All points are sampled
together as one batched einsum per iteration (no vmapped per-point gathers,
which dominated the tracking benchmark at ~2 ms/frame; this form measures
~8x faster in context).

API mirrors the cv2 call: (shifted_points, status, errors). Errors are the
mean absolute patch difference (cv2's error measure for flags=0).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# cv2.pyrDown 5-tap kernel.
_PYR_KERNEL = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Gaussian blur + 2x subsample (cv2.pyrDown)."""
    k = _PYR_KERNEL
    img = img[None, :, :, None]
    kh = k.reshape(5, 1, 1, 1)
    kw = k.reshape(1, 5, 1, 1)
    img = lax.conv_general_dilated(
        img, kh, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    img = lax.conv_general_dilated(
        img, kw, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return img[0, ::2, ::2, 0]


def _hat_weights(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """(P, window, size) bilinear interpolation weights for float coords.

    Row i holds ``max(0, 1 - |coords[p, i] - r|)`` over r in [0, size):
    exactly two non-zeros for in-range coords, all-zero outside — matching
    bilinear sampling with zero padding beyond the border.
    """
    r = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - r))


def _sample_patches(
    img: jnp.ndarray, centers: jnp.ndarray, offsets: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear (window, window) patches around float centers, via matmuls.

    Args:
        img: (H, W).
        centers: (P, 2) xy.
        offsets: (window,) integer offsets, e.g. arange(-half, half+1).

    Returns:
        (P, window, window) patches; zero beyond image borders.
    """
    H, W = img.shape
    ys = centers[:, 1, None] + offsets  # (P, window)
    xs = centers[:, 0, None] + offsets
    wy = _hat_weights(ys, H)  # (P, window, H)
    wx = _hat_weights(xs, W)  # (P, window, W)
    # patch[p, i, j] = sum_{r, c} wy[p,i,r] img[r,c] wx[p,j,c]
    tmp = jnp.einsum("pir,rc->pic", wy, img)
    return jnp.einsum("pic,pjc->pij", tmp, wx)


@functools.partial(
    jax.jit, static_argnames=("window_size", "max_levels", "max_iters")
)
def lk_flow(
    ref_img: jnp.ndarray,
    new_img: jnp.ndarray,
    points: jnp.ndarray,
    window_size: int = 21,
    max_levels: int = 3,
    max_iters: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Track points from ref_img to new_img.

    Args:
        ref_img / new_img: (H, W) float32 grayscale (0-255 range is fine).
        points: (n_points, 2) xy; NaN points pass through as NaN with status 0.

    Returns:
        shifted: (n_points, 2) xy in new_img; status: (n_points,) bool;
        errors: (n_points,) mean |patch diff|.
    """
    ref_img = ref_img.astype(jnp.float32)
    new_img = new_img.astype(jnp.float32)
    half = (window_size - 1) // 2
    offsets = jnp.arange(-half, half + 1, dtype=jnp.float32)

    # Build pyramids (static level count).
    ref_pyr = [ref_img]
    new_pyr = [new_img]
    for _ in range(max_levels):
        ref_pyr.append(_pyr_down(ref_pyr[-1]))
        new_pyr.append(_pyr_down(new_pyr[-1]))

    valid_in = ~jnp.isnan(points).any(axis=-1)
    pts = jnp.nan_to_num(points)
    P = pts.shape[0]

    ex = jnp.array([1.0, 0.0], jnp.float32)
    ey = jnp.array([0.0, 1.0], jnp.float32)

    g = jnp.zeros((P, 2), jnp.float32)  # accumulated flow from coarser levels
    ok = valid_in
    err = jnp.zeros((P,), jnp.float32)
    for level in range(max_levels, -1, -1):
        rimg = ref_pyr[level]
        nimg = new_pyr[level]
        p = pts / (2.0**level)  # (P, 2)
        patch_i = _sample_patches(rimg, p, offsets)
        # Central-difference gradients on the template patch.
        gx = (
            _sample_patches(rimg, p + ex, offsets)
            - _sample_patches(rimg, p - ex, offsets)
        ) / 2.0
        gy = (
            _sample_patches(rimg, p + ey, offsets)
            - _sample_patches(rimg, p - ey, offsets)
        ) / 2.0
        gxx = jnp.sum(gx * gx, axis=(1, 2))
        gyy = jnp.sum(gy * gy, axis=(1, 2))
        gxy = jnp.sum(gx * gy, axis=(1, 2))
        det = gxx * gyy - gxy * gxy
        trace = gxx + gyy
        min_eig = (trace - jnp.sqrt(jnp.maximum(trace**2 - 4 * det, 0.0))) / 2.0
        well_posed = min_eig / (window_size**2) > min_eig_threshold
        inv = jnp.where(det != 0, 1.0 / det, 0.0)
        # Ginv rows: [[gyy, -gxy], [-gxy, gxx]] * inv, shaped (P, 2, 2).
        ginv = (
            jnp.stack(
                [
                    jnp.stack([gyy, -gxy], axis=-1),
                    jnp.stack([-gxy, gxx], axis=-1),
                ],
                axis=-2,
            )
            * inv[:, None, None]
        )

        def iter_body(_, carry):
            d, done = carry
            patch_j = _sample_patches(nimg, p + g + d, offsets)
            diff = patch_i - patch_j  # (P, w, w)
            b = jnp.stack(
                [jnp.sum(gx * diff, axis=(1, 2)), jnp.sum(gy * diff, axis=(1, 2))],
                axis=-1,
            )  # (P, 2)
            delta = jnp.einsum("pij,pj->pi", ginv, b)
            frozen = done | ~well_posed
            new_d = jnp.where(frozen[:, None], d, d + delta)
            done = done | (jnp.linalg.norm(delta, axis=-1) < eps)
            return (new_d, done)

        d, _ = lax.fori_loop(
            0,
            max_iters,
            iter_body,
            (jnp.zeros((P, 2), jnp.float32), jnp.zeros((P,), bool)),
        )
        g = jnp.where(level > 0, 2.0 * (g + d), g + d)
        ok = ok & well_posed
        if level == 0:
            patch_j = _sample_patches(nimg, p + g, offsets)
            err = jnp.mean(jnp.abs(patch_i - patch_j), axis=(1, 2))

    new_pt = pts + g
    H, W = ref_img.shape
    in_bounds = (
        (new_pt[:, 0] >= 0)
        & (new_pt[:, 0] <= W - 1)
        & (new_pt[:, 1] >= 0)
        & (new_pt[:, 1] <= H - 1)
    )
    ok = ok & in_bounds
    shifted = jnp.where(ok[:, None], new_pt, jnp.nan)
    return shifted, ok, err
