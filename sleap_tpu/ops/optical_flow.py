"""Batched pyramidal Lucas-Kanade optical flow (JAX, on-chip).

Replaces the reference flow-shift tracker's per-frame host OpenCV call
(``cv2.calcOpticalFlowPyrLK`` at ``/root/reference/sleap/nn/tracking.py:320``)
— the BASELINE "north star" requires cross-frame instance matching to run as
a batched JAX op. Same algorithm family as OpenCV: Gaussian image pyramid,
per-keypoint window gradients, iterative Newton updates propagated
coarse-to-fine; keypoints are vmapped so all instances' points solve in
parallel on the device.

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


def _bilinear_patch(img: jnp.ndarray, center: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Sample a (W, W) patch at float center + integer offsets (bilinear)."""
    H, W = img.shape
    ys = center[1] + offsets  # (W,)
    xs = center[0] + offsets
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]

    def at(yi, xi):
        valid = (yi[:, None] >= 0) & (yi[:, None] <= H - 1) & (xi[None, :] >= 0) & (
            xi[None, :] <= W - 1
        )
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        return jnp.where(valid, img[yc][:, xc], 0.0)

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


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

    def track_point(pt, valid):
        g = jnp.zeros(2)  # accumulated flow from coarser levels
        err = jnp.float32(0.0)
        ok = valid
        for level in range(max_levels, -1, -1):
            rimg = ref_pyr[level]
            nimg = new_pyr[level]
            p = pt / (2.0**level)
            patch_i = _bilinear_patch(rimg, p, offsets)
            # Central-difference gradients on the template patch.
            gx = (
                _bilinear_patch(rimg, p + jnp.array([1.0, 0.0]), offsets)
                - _bilinear_patch(rimg, p - jnp.array([1.0, 0.0]), offsets)
            ) / 2.0
            gy = (
                _bilinear_patch(rimg, p + jnp.array([0.0, 1.0]), offsets)
                - _bilinear_patch(rimg, p - jnp.array([0.0, 1.0]), offsets)
            ) / 2.0
            gxx = jnp.sum(gx * gx)
            gyy = jnp.sum(gy * gy)
            gxy = jnp.sum(gx * gy)
            det = gxx * gyy - gxy * gxy
            trace = gxx + gyy
            min_eig = (trace - jnp.sqrt(jnp.maximum(trace**2 - 4 * det, 0.0))) / 2.0
            well_posed = min_eig / (window_size**2) > min_eig_threshold
            inv = jnp.where(det != 0, 1.0 / det, 0.0)
            Ginv = jnp.array([[gyy, -gxy], [-gxy, gxx]]) * inv

            def iter_body(_, carry):
                d, done = carry
                patch_j = _bilinear_patch(nimg, p + g + d, offsets)
                diff = patch_i - patch_j
                b = jnp.array([jnp.sum(gx * diff), jnp.sum(gy * diff)])
                delta = Ginv @ b
                new_d = jnp.where(done | ~well_posed, d, d + delta)
                done = done | (jnp.linalg.norm(delta) < eps)
                return (new_d, done)

            d, _ = lax.fori_loop(
                0, max_iters, iter_body, (jnp.zeros(2), jnp.bool_(False))
            )
            g = jnp.where(level > 0, 2.0 * (g + d), g + d)
            ok = ok & well_posed
            if level == 0:
                patch_j = _bilinear_patch(nimg, p + g, offsets)
                err = jnp.mean(jnp.abs(patch_i - patch_j))
        new_pt = pt + g
        H, W = ref_img.shape
        in_bounds = (
            (new_pt[0] >= 0) & (new_pt[0] <= W - 1)
            & (new_pt[1] >= 0) & (new_pt[1] <= H - 1)
        )
        ok = ok & in_bounds
        return jnp.where(ok, new_pt, jnp.nan), ok, err

    shifted, status, errors = jax.vmap(track_point)(pts, valid_in)
    return shifted, status, errors
