"""Peak finding on confidence maps (JAX, jittable, static shapes).

Rebuild of ``/root/reference/sleap/nn/peak_finding.py`` with TPU-native
contracts:

- Global peaks (``find_global_peaks``) match the reference exactly
  (one peak per sample×channel, NaN below threshold, optional integral /
  local-gradient subpixel refinement).
- Local peaks are returned with **static shapes**: instead of the reference's
  ragged ``tf.where`` output (peak_finding.py:249-293), we return the top-K
  peaks per sample×channel with a validity mask. K (``max_peaks``) is a
  compile-time bound; callers choose it from config (e.g. ``max_instances``).
  A host-side wrapper flattens to the reference's variable-length layout.
- The reference's ``tf.nn.dilation2d`` NMS (center > all 8 neighbors,
  strictly) and ``tf.image.crop_and_resize`` patch semantics (zero
  extrapolation outside the image) are reproduced exactly.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# --------------------------------------------------------------------------- #
# Kernels / smoothing
# --------------------------------------------------------------------------- #


def make_gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    """(size, size) unnormalized Gaussian kernel with max value 1.0."""
    gv = jnp.arange(-(size // 2), (size // 2) + 1, dtype=jnp.float32)
    return jnp.exp(
        -(gv.reshape(1, -1) ** 2 + gv.reshape(-1, 1) ** 2) / (2 * sigma**2)
    )


def smooth_imgs(imgs: jnp.ndarray, kernel_size: int = 5, sigma: float = 1.0) -> jnp.ndarray:
    """Channelwise Gaussian blur of (samples, height, width, channels) maps."""
    channels = imgs.shape[-1]
    kernel = make_gaussian_kernel(kernel_size, sigma) / (2 * jnp.pi * sigma**2)
    # Depthwise conv: (H, W, in_total=C, multiplier=1) -> HWIO with groups=C.
    kernel = jnp.broadcast_to(
        kernel.reshape(kernel_size, kernel_size, 1, 1),
        (kernel_size, kernel_size, 1, channels),
    )
    return lax.conv_general_dilated(
        imgs.astype(jnp.float32),
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
    )


# --------------------------------------------------------------------------- #
# Bboxes / crops
# --------------------------------------------------------------------------- #


def make_centered_bboxes(
    centroids: jnp.ndarray, box_height: int, box_width: int
) -> jnp.ndarray:
    """(n, 4) (y1, x1, y2, x2) boxes centered on pixel-centered centroids.

    Reference: ``/root/reference/sleap/nn/data/instance_cropping.py:124``.
    A (3, 3) patch centered at (x, y) = (1, 1) has box (0, 0, 2, 2).
    """
    cx = centroids[..., 0]
    cy = centroids[..., 1]
    dy = (box_height - 1) / 2.0
    dx = (box_width - 1) / 2.0
    return jnp.stack([cy - dy, cx - dx, cy + dy, cx + dx], axis=-1)


def crop_and_resize(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    box_indices: jnp.ndarray,
    crop_size: Tuple[int, int],
) -> jnp.ndarray:
    """Bilinear crop-and-resize matching ``tf.image.crop_and_resize``.

    Args:
        images: (samples, height, width, channels).
        boxes: (n_boxes, 4) **unnormalized** (y1, x1, y2, x2) in pixel-center
            coordinates (the reference normalizes by (dim-1); we fold that in).
        box_indices: (n_boxes,) int sample index per box.
        crop_size: (crop_height, crop_width) static ints.

    Returns:
        (n_boxes, crop_height, crop_width, channels) float32. Samples falling
        outside the image contribute 0 (TF's ``extrapolation_value=0``).
    """
    crop_h, crop_w = crop_size
    H, W = images.shape[1], images.shape[2]

    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # Sampling positions per box: corners map onto corners.
    if crop_h > 1:
        ys = y1[:, None] + (y2 - y1)[:, None] * (
            jnp.arange(crop_h, dtype=jnp.float32)[None, :] / (crop_h - 1)
        )
    else:
        ys = ((y1 + y2) / 2.0)[:, None]
    if crop_w > 1:
        xs = x1[:, None] + (x2 - x1)[:, None] * (
            jnp.arange(crop_w, dtype=jnp.float32)[None, :] / (crop_w - 1)
        )
    else:
        xs = ((x1 + x2) / 2.0)[:, None]

    imgs = images.astype(jnp.float32)
    bi = box_indices.astype(jnp.int32)[:, None, None]  # (n, 1, 1)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[:, :, None]  # (n, crop_h, 1)
    wx = (xs - x0)[:, None, :]  # (n, 1, crop_w)

    def gather2d(yi, xi):
        # (n, crop_h) x (n, crop_w) integer coords -> (n, crop_h, crop_w, C).
        # One batched gather straight out of the image batch — never
        # materializes per-box copies of the full images.
        valid = (
            (yi[:, :, None] >= 0)
            & (yi[:, :, None] <= H - 1)
            & (xi[:, None, :] >= 0)
            & (xi[:, None, :] <= W - 1)
        )
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)[:, :, None]
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)[:, None, :]
        vals = imgs[bi, yc, xc]  # advanced indexing -> single gather
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather2d(y0, x0)
    v01 = gather2d(y0, x0 + 1)
    v10 = gather2d(y0 + 1, x0)
    v11 = gather2d(y0 + 1, x0 + 1)

    wy = wy[..., None]
    wx = wx[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def crop_bboxes(
    images: jnp.ndarray,
    bboxes: jnp.ndarray,
    sample_inds: jnp.ndarray,
    crop_size: Tuple[int, int],
) -> jnp.ndarray:
    """Reference-compatible wrapper (peak_finding.py:135); static crop size."""
    return crop_and_resize(images, bboxes, sample_inds, crop_size)


def crop_bboxes_unit(
    images: jnp.ndarray,
    top_left: jnp.ndarray,
    box_indices: jnp.ndarray,
    crop_size: Tuple[int, int],
) -> jnp.ndarray:
    """Bilinear crops with unit sample spacing — the top-down fast path.

    Equivalent to :func:`crop_and_resize` when the box spans exactly
    ``crop - 1`` pixels (sample spacing 1.0), which is always the case for
    centered instance crops. Implemented as a vmapped ``dynamic_slice`` plus a
    2x2-tap fractional blend instead of gathers — dynamic slices map onto TPU
    DMA engines, while large gathers serialize badly.

    Args:
        images: (samples, H, W, C).
        top_left: (n_boxes, 2) float (x1, y1) of each crop's first sample.
        box_indices: (n_boxes,) int sample index per box.
        crop_size: (crop_h, crop_w) static ints.

    Returns:
        (n_boxes, crop_h, crop_w, C) float32; out-of-image area contributes 0
        (TF ``extrapolation_value=0``).
    """
    crop_h, crop_w = crop_size
    H, W, C = images.shape[1], images.shape[2], images.shape[3]

    if not FORCE_XLA_PEAKS and jax.default_backend() == "tpu":
        from sleap_tpu.ops.pallas_crops import (
            crop_bboxes_unit_pallas,
            crop_bboxes_unit_pallas_ok,
        )

        if crop_bboxes_unit_pallas_ok(images.shape, crop_size, images.dtype):
            # One aligned DMA + dynamic-roll realignment per crop; the XLA
            # vmapped dynamic_slice lowers to a sequential per-crop loop
            # costing ~1.4 ms/batch-16 @1024² (see pallas_crops.py).
            return crop_bboxes_unit_pallas(images, top_left, box_indices, crop_size)

    x1 = top_left[:, 0]
    y1 = top_left[:, 1]
    x0 = jnp.floor(x1)
    y0 = jnp.floor(y1)
    fx = (x1 - x0)[:, None, None, None]
    fy = (y1 - y0)[:, None, None, None]

    # Slice from origins clamped into the image (padding the full frame
    # costs ~4x this whole function on TPU), then re-align each patch to
    # its true origin with a per-crop roll and zero taps whose original
    # coordinates fall outside the image (TF extrapolation_value=0).
    yd = y0.astype(jnp.int32)
    xd = x0.astype(jnp.int32)
    yi = jnp.clip(yd, 0, max(H - crop_h - 1, 0))
    xi = jnp.clip(xd, 0, max(W - crop_w - 1, 0))

    def one(bi, yy, xx):
        return lax.dynamic_slice(
            images[bi], (yy, xx, 0), (crop_h + 1, crop_w + 1, C)
        )

    patches = jax.vmap(one)(box_indices.astype(jnp.int32), yi, xi)
    patches = patches.astype(jnp.float32)

    # Re-align each patch to its true origin: out[r] = patch[r + dy]. As
    # one-hot permutation MATMULS, not jnp.roll with traced shifts —
    # vmapped dynamic roll lowers to while-loop gathers that blow up
    # superlinearly with batch (measured: the top-down batch-32 "cliff",
    # 2500 -> 1030 FPS, was two _roll_dynamic whiles at 11 ms each).
    # Out-of-range selections produce all-zero rows, which IS the required
    # zero extrapolation (TF crop_and_resize extrapolation_value=0).
    rr = jnp.arange(crop_h + 1)
    cc = jnp.arange(crop_w + 1)
    dy = (yd - yi)[:, None, None]
    dx = (xd - xi)[:, None, None]
    row_oh = (rr[None, :, None] + dy == rr[None, None, :]).astype(jnp.float32)
    col_oh = (cc[None, :, None] + dx == cc[None, None, :]).astype(jnp.float32)
    patches = jnp.einsum("nrs,nswc->nrwc", row_oh, patches)
    patches = jnp.einsum("nwv,nrvc->nrwc", col_oh, patches)
    gy = yd[:, None] + jnp.arange(crop_h + 1)[None, :]
    gx = xd[:, None] + jnp.arange(crop_w + 1)[None, :]
    my = ((gy >= 0) & (gy < H)).astype(jnp.float32)[:, :, None, None]
    mx = ((gx >= 0) & (gx < W)).astype(jnp.float32)[:, None, :, None]
    patches = patches * my * mx
    top = patches[:, :-1, :-1] * (1 - fx) + patches[:, :-1, 1:] * fx
    bot = patches[:, 1:, :-1] * (1 - fx) + patches[:, 1:, 1:] * fx
    return top * (1 - fy) + bot * fy


# --------------------------------------------------------------------------- #
# Integral / gradient refinement
# --------------------------------------------------------------------------- #


def integral_regression(
    cms: jnp.ndarray, xv: jnp.ndarray, yv: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted centroid of (samples, height, width, channels) maps."""
    z = jnp.sum(cms, axis=(1, 2))
    x_hat = jnp.sum(xv.reshape(1, 1, -1, 1) * cms, axis=(1, 2)) / z
    y_hat = jnp.sum(yv.reshape(1, -1, 1, 1) * cms, axis=(1, 2)) / z
    return x_hat, y_hat


def find_offsets_local_direction(
    centered_patches: jnp.ndarray, delta: float = 0.25
) -> jnp.ndarray:
    """±delta offset by the sign of the gradient through the center pixel.

    Args:
        centered_patches: (samples, 3, 3, 1).

    Returns:
        (samples, 2) of (dx, dy) offsets in {-delta, 0, +delta}.
    """
    dx = centered_patches[:, 1, 2, :] - centered_patches[:, 1, 0, :]
    dy = centered_patches[:, 2, 1, :] - centered_patches[:, 0, 1, :]
    return jnp.sign(jnp.concatenate([dx, dy], axis=1)) * delta


def _extract_patches(
    cms_flat: jnp.ndarray, peaks: jnp.ndarray, map_inds: jnp.ndarray, crop_size: int
) -> jnp.ndarray:
    """Integer-aligned (crop, crop) patches with zero padding at borders.

    Args:
        cms_flat: (n_maps, height, width) confidence maps.
        peaks: (n_peaks, 2) xy rough peak locations (may be NaN).
        map_inds: (n_peaks,) which map each peak reads from.

    Returns:
        (n_peaks, crop, crop, 1) patches (garbage where peak was NaN — callers
        rely on NaN propagation of the rough peak coordinate instead).
    """
    half = crop_size // 2
    padded = jnp.pad(cms_flat, ((0, 0), (half, half), (half, half)))
    x = jnp.nan_to_num(peaks[:, 0]).astype(jnp.int32)
    y = jnp.nan_to_num(peaks[:, 1]).astype(jnp.int32)
    x = jnp.clip(x, 0, cms_flat.shape[2] - 1)
    y = jnp.clip(y, 0, cms_flat.shape[1] - 1)

    def one(mi, yi, xi):
        # 3D dynamic_slice: never materializes a per-peak copy of the map.
        return lax.dynamic_slice(padded, (mi, yi, xi), (1, crop_size, crop_size))[0]

    patches = jax.vmap(one)(map_inds, y, x)
    return patches[..., None]


def _refine_peaks(
    cms_flat: jnp.ndarray,
    rough_peaks: jnp.ndarray,
    map_inds: jnp.ndarray,
    refinement: Optional[str],
    integral_patch_size: int,
) -> jnp.ndarray:
    """Apply subpixel refinement to (n_peaks, 2) rough peaks."""
    if refinement is None:
        return rough_peaks
    if refinement == "integral":
        crop_size = integral_patch_size
        patches = _extract_patches(cms_flat, rough_peaks, map_inds, crop_size)
        gv = jnp.arange(crop_size, dtype=jnp.float32) - ((crop_size - 1) / 2)
        dx_hat, dy_hat = integral_regression(patches, xv=gv, yv=gv)
        offsets = jnp.concatenate([dx_hat, dy_hat], axis=1)
    elif refinement == "local":
        patches = _extract_patches(cms_flat, rough_peaks, map_inds, 3)
        offsets = find_offsets_local_direction(patches, 0.25)
    else:
        return rough_peaks
    return rough_peaks + offsets


# --------------------------------------------------------------------------- #
# Global peaks
# --------------------------------------------------------------------------- #


def find_global_peaks_rough(
    cms: jnp.ndarray, threshold: float = 0.1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid-aligned global maxima per sample×channel.

    Returns:
        peak_points: (samples, channels, 2) xy, NaN below threshold.
        peak_vals: (samples, channels).
    """
    samples, H, W, channels = cms.shape
    flat = jnp.transpose(cms, (0, 3, 1, 2)).reshape(samples, channels, H * W)
    idx = jnp.argmax(flat, axis=-1)
    peak_vals = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    peak_points = jnp.stack([xs, ys], axis=-1)
    peak_points = jnp.where(peak_vals[..., None] < threshold, jnp.nan, peak_points)
    return peak_points, peak_vals


@functools.partial(jax.jit, static_argnames=("threshold", "refinement", "integral_patch_size"))
def find_global_peaks(
    cms: jnp.ndarray,
    threshold: float = 0.2,
    refinement: Optional[str] = None,
    integral_patch_size: int = 5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global peaks with optional subpixel refinement.

    Reference: peak_finding.py ``find_global_peaks:311``.

    Returns:
        peak_points: (samples, channels, 2) xy (NaN below threshold).
        peak_vals: (samples, channels).
    """
    if refinement == "integral" and not FORCE_XLA_PEAKS and jax.default_backend() == "tpu":
        # Fused single-pass Pallas kernel (see ops/pallas_peaks.py): ~1.5x
        # faster than the XLA decomposition on TPU, numerically equivalent.
        from sleap_tpu.ops.pallas_peaks import find_global_peaks_integral_pallas

        return find_global_peaks_integral_pallas(
            cms, threshold=threshold, integral_patch_size=integral_patch_size
        )

    rough_peaks, peak_vals = find_global_peaks_rough(cms, threshold=threshold)
    if refinement is None:
        return rough_peaks, peak_vals

    samples, H, W, channels = cms.shape
    cms_flat = jnp.transpose(cms, (0, 3, 1, 2)).reshape(samples * channels, H, W)
    flat_peaks = rough_peaks.reshape(samples * channels, 2)
    map_inds = jnp.arange(samples * channels, dtype=jnp.int32)
    refined = _refine_peaks(cms_flat, flat_peaks, map_inds, refinement, integral_patch_size)
    # NaN rough peaks stay NaN: rough + offset where rough is NaN -> NaN.
    return refined.reshape(samples, channels, 2), peak_vals


@jax.jit
def find_global_peaks_with_offsets(
    cms: jnp.ndarray, offsets: jnp.ndarray, threshold: float = 0.2
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global peaks refined by learned offset maps.

    Args:
        offsets: (samples, height, width, 2 * channels) learned offsets.

    Reference: peak_finding.py:567.
    """
    rough_peaks, peak_vals = find_global_peaks_rough(cms, threshold=threshold)
    samples, H, W, channels = cms.shape
    off = offsets.reshape(samples, H, W, channels, 2)

    xi = jnp.nan_to_num(rough_peaks[..., 0]).astype(jnp.int32)
    yi = jnp.nan_to_num(rough_peaks[..., 1]).astype(jnp.int32)
    ch = jnp.broadcast_to(jnp.arange(channels)[None, :], (samples, channels))
    sm = jnp.broadcast_to(jnp.arange(samples)[:, None], (samples, channels))
    peak_offsets = off[sm, yi, xi, ch]  # (samples, channels, 2)
    return rough_peaks + peak_offsets, peak_vals


# --------------------------------------------------------------------------- #
# Local peaks (static top-K layout)
# --------------------------------------------------------------------------- #


def _local_nms(cms: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Bool map of pixels strictly greater than all 8 neighbors and threshold.

    Matches the reference's dilation2d trick (peak_finding.py:273-293): the
    center must be strictly greater than every neighbor.
    """
    neg_inf = jnp.array(-jnp.inf, dtype=cms.dtype)
    padded = jnp.pad(cms, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg_inf)
    H, W = cms.shape[1], cms.shape[2]
    neighbor_max = neg_inf
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = lax.dynamic_slice(
                padded, (0, dy + 1, dx + 1, 0), (cms.shape[0], H, W, cms.shape[3])
            )
            neighbor_max = jnp.maximum(neighbor_max, shifted)
    return (cms > neighbor_max) & (cms > threshold)


def _local_nms_nchw(cms: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """:func:`_local_nms` for (..., H, W) layout.

    On TPU the channels-last variant puts C (often ~13) in the lane
    dimension (128 wide) — ~10% utilization; with H, W innermost the shifts
    and maxes run at full lane width.
    """
    neg_inf = jnp.array(-jnp.inf, dtype=cms.dtype)
    pads = [(0, 0)] * (cms.ndim - 2) + [(1, 1), (1, 1)]
    padded = jnp.pad(cms, pads, constant_values=neg_inf)
    H, W = cms.shape[-2], cms.shape[-1]
    neighbor_max = neg_inf
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = lax.slice(
                padded,
                (0,) * (cms.ndim - 2) + (dy + 1, dx + 1),
                cms.shape[:-2] + (dy + 1 + H, dx + 1 + W),
            )
            neighbor_max = jnp.maximum(neighbor_max, shifted)
    return (cms > neighbor_max) & (cms > threshold)


def _hierarchical_top_k(
    vals: jnp.ndarray, k: int, block: int = 2048
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage top-k over the last axis.

    ``lax.top_k`` over a 64k+ axis is a major cost in bottom-up inference.
    Splitting into per-block top-k followed by a top-k over the block
    winners is exact as long as k <= block. Block size tuned IN MODEL
    CONTEXT (isolated microbenchmarks mislead here — fusion with the conv
    epilogue inverts the ranking): on v5e, bottom-up peaks stage @1024²
    batch 8 measured 16.8 ms with block 2048/4096, 18.0 with 1024, 18.6
    flat, 23.3 with 256.
    """
    n = vals.shape[-1]
    if n <= 4 * block or n % block != 0:
        return lax.top_k(vals, k)
    nb = n // block
    v = vals.reshape(*vals.shape[:-1], nb, block)
    bv, bi = lax.top_k(v, min(k, block))  # (..., nb, k)
    offs = (jnp.arange(nb, dtype=bi.dtype) * block)[:, None]
    bi = (bi + offs).reshape(*vals.shape[:-1], -1)
    bv = bv.reshape(*vals.shape[:-1], -1)
    fv, fi = lax.top_k(bv, k)
    return fv, jnp.take_along_axis(bi, fi, axis=-1)


# Set True while tracing GSPMD-sharded (multi-chip) computations: a
# pallas_call cannot be auto-partitioned by GSPMD, so the sharded predictor
# paths (parallel/distributed.py) pin the XLA implementation instead.
FORCE_XLA_PEAKS = False


def _pallas_local_peaks_ok(H: int, W: int, refinement: Optional[str]) -> bool:
    """Whether the fused Mosaic kernel can serve this local-peaks call."""
    if FORCE_XLA_PEAKS:
        return False
    if refinement not in (None, "integral"):
        return False
    if H % 8 != 0 or W % 128 != 0:
        return False  # (8, 128) tile rule for the VMEM block
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover - backend init failure
        return False


def find_local_peaks(
    cms: jnp.ndarray,
    max_peaks: int = 32,
    threshold: float = 0.2,
    refinement: Optional[str] = None,
    integral_patch_size: int = 5,
    use_pallas: Optional[bool] = None,
    channels_first: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Thin dispatcher: resolve the Pallas/XLA choice OUTSIDE the jitted body
    so it participates in the jit cache key (FORCE_XLA_PEAKS flips must not
    hit a stale cached trace).

    ``channels_first=True`` means ``cms`` is (channels, samples, H, W) — the
    layout the :class:`~sleap_tpu.models.model._ChannelsFirstConv1x1` head
    emits natively — and skips the 436 MB (S,H,W,C)->(S,C,H,W) relayout.
    Returns are (samples, channels, ...) either way.
    """
    h_ax = 2 if channels_first else 1
    if use_pallas is None:
        use_pallas = _pallas_local_peaks_ok(
            cms.shape[h_ax], cms.shape[h_ax + 1], refinement
        )
    return _find_local_peaks_jit(
        cms,
        max_peaks=max_peaks,
        threshold=threshold,
        refinement=refinement,
        integral_patch_size=integral_patch_size,
        use_pallas=use_pallas,
        channels_first=channels_first,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_peaks",
        "threshold",
        "refinement",
        "integral_patch_size",
        "use_pallas",
        "channels_first",
    ),
)
def _find_local_peaks_jit(
    cms: jnp.ndarray,
    max_peaks: int = 32,
    threshold: float = 0.2,
    refinement: Optional[str] = None,
    integral_patch_size: int = 5,
    use_pallas: bool = False,
    channels_first: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-K local maxima per sample×channel, statically shaped.

    Args:
        cms: (samples, height, width, channels), or
            (channels, samples, height, width) when ``channels_first``.
        max_peaks: static bound K on peaks per sample×channel.

    Returns:
        peak_points: (samples, channels, K, 2) xy; NaN where invalid.
        peak_vals: (samples, channels, K); 0 where invalid.
        peak_mask: (samples, channels, K) bool validity.
    """
    if use_pallas and not channels_first and refinement in (None, "integral"):
        from sleap_tpu.ops.pallas_peaks import (
            find_local_peaks_fused_pallas_hwcs,
            local_peaks_hwcs_ok,
        )

        samples, H, W, channels = cms.shape
        if local_peaks_hwcs_ok(
            (H, W, channels, samples), cms.dtype, threshold, integral_patch_size
        ):
            # (H, W, C, S)-standard is the conv head's preferred physical
            # output layout, so this transpose folds to a bitcast — the
            # (S, C, H, W) path below pays a full relayout copy of the maps.
            hwcs = jnp.transpose(cms, (1, 2, 3, 0))
            peaks_f, vals_f = find_local_peaks_fused_pallas_hwcs(
                hwcs,
                max_peaks=max_peaks,
                threshold=threshold,
                refine=refinement == "integral",
            )
            valid = jnp.isfinite(vals_f)
            peaks = jnp.where(valid[..., None], peaks_f, jnp.nan)
            return peaks, jnp.where(valid, vals_f, 0.0), valid

    if channels_first:
        # Maps already arrive as per-channel (H, W) planes; the per-map math
        # below is order-agnostic, so run it on (C, S, ...) and swap the two
        # tiny leading axes of the results at the end.
        channels, samples, H, W = cms.shape
        cms_t = cms  # (C, S, H, W)
    else:
        samples, H, W, channels = cms.shape
        # ONE transpose to (S, C, H, W), then NMS / top-k / refinement all run
        # in that layout: W sits in the lane dim (full 128-lane utilization,
        # vs C~13 channels-last) and the refinement reuses the same array
        # instead of a second 27 MB transpose.
        cms_t = jnp.transpose(cms, (0, 3, 1, 2))  # (S, C, H, W)

    def _unswap(arr):
        # (C, S, ...) -> (S, C, ...) on K-sized arrays (tiny) when needed.
        return jnp.swapaxes(arr, 0, 1) if channels_first else arr

    if use_pallas:
        from sleap_tpu.ops.pallas_peaks import find_local_peaks_fused_pallas

        # NOTE (round 3): feeding the kernel (S, C, W, H) — hoping the
        # (0, 3, 2, 1) transpose would bitcast the conv's batch-minor
        # output layout — does NOT remove the pre-pallas relayout copy
        # (the head conv emits {0,1,2,3}: BATCH innermost), measured equal
        # in-context. Keep (S, C, H, W): row-major tie-break parity.
        flat = cms_t.reshape(samples * channels, H, W)
        peaks_f, vals_f = find_local_peaks_fused_pallas(
            flat,
            max_peaks=max_peaks,
            threshold=threshold,
            integral_patch_size=integral_patch_size,
            refine=refinement == "integral",
        )
        d0, d1 = cms_t.shape[0], cms_t.shape[1]
        peaks = _unswap(peaks_f.reshape(d0, d1, max_peaks, 2))
        vals = _unswap(vals_f.reshape(d0, d1, max_peaks))
        valid = jnp.isfinite(vals)
        peaks = jnp.where(valid[..., None], peaks, jnp.nan)
        return peaks, jnp.where(valid, vals, 0.0), valid
    is_peak = _local_nms_nchw(cms_t, threshold)

    d0, d1 = cms_t.shape[0], cms_t.shape[1]
    flat_vals = cms_t.reshape(d0, d1, H * W)
    flat_mask = is_peak.reshape(d0, d1, H * W)
    masked_vals = jnp.where(flat_mask, flat_vals, -jnp.inf)

    top_vals, top_idx = _hierarchical_top_k(masked_vals, max_peaks)  # (d0, d1, K)
    valid = jnp.isfinite(top_vals)
    ys = (top_idx // W).astype(jnp.float32)
    xs = (top_idx % W).astype(jnp.float32)
    peaks = jnp.stack([xs, ys], axis=-1)  # (d0, d1, K, 2)

    if refinement is not None:
        cms_flat = cms_t.reshape(d0 * d1, H, W)
        flat_peaks = peaks.reshape(d0 * d1 * max_peaks, 2)
        map_inds = jnp.repeat(
            jnp.arange(d0 * d1, dtype=jnp.int32), max_peaks
        )
        refined = _refine_peaks(
            cms_flat, flat_peaks, map_inds, refinement, integral_patch_size
        )
        peaks = refined.reshape(d0, d1, max_peaks, 2)

    valid = _unswap(valid)
    peaks = jnp.where(valid[..., None], _unswap(peaks), jnp.nan)
    vals = jnp.where(valid, _unswap(top_vals), 0.0)
    return peaks, vals, valid


@functools.partial(jax.jit, static_argnames=("max_peaks", "threshold"))
def find_local_peaks_with_offsets(
    cms: jnp.ndarray,
    offsets: jnp.ndarray,
    max_peaks: int = 32,
    threshold: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Local peaks refined by learned offset maps (peak_finding.py:647).

    Args/returns as :func:`find_local_peaks`; ``offsets`` is
    (samples, height, width, 2 * channels).
    """
    peaks, vals, mask = find_local_peaks(
        cms, max_peaks=max_peaks, threshold=threshold, refinement=None
    )
    samples, H, W, channels = cms.shape
    off = offsets.reshape(samples, H, W, channels, 2)
    xi = jnp.nan_to_num(peaks[..., 0]).astype(jnp.int32)
    yi = jnp.nan_to_num(peaks[..., 1]).astype(jnp.int32)
    sm = jnp.arange(samples)[:, None, None]
    ch = jnp.arange(channels)[None, :, None]
    peak_offsets = off[sm, yi, xi, ch]  # (S, C, K, 2)
    refined = peaks + peak_offsets
    return jnp.where(mask[..., None], refined, jnp.nan), vals, mask


def flatten_local_peaks(
    peaks: jnp.ndarray, vals: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Host-side: convert static (S, C, K) layout to the reference's flat
    variable-length (n_peaks, ...) layout (points, vals, sample_inds,
    channel_inds) for API/tests parity."""
    import numpy as np

    peaks = np.asarray(peaks)
    vals = np.asarray(vals)
    mask = np.asarray(mask)
    S, C, K = mask.shape
    sm = np.broadcast_to(np.arange(S)[:, None, None], (S, C, K))
    ch = np.broadcast_to(np.arange(C)[None, :, None], (S, C, K))
    m = mask.reshape(-1)
    return (
        peaks.reshape(-1, 2)[m],
        vals.reshape(-1)[m],
        sm.reshape(-1)[m].astype(np.int32),
        ch.reshape(-1)[m].astype(np.int32),
    )
