"""Pallas TPU crop kernel: per-program DMA + dynamic-roll alignment.

Replaces the vmapped ``dynamic_slice`` crops in
:func:`sleap_tpu.ops.peak_finding.crop_bboxes_unit` for the top-down hot
path. XLA lowers the vmapped slice/update pattern to a sequential per-crop
loop (~1.4 ms of a 4.1 ms batch-16 top-down iteration, profiled); here each
grid program issues ONE aligned DMA from the HBM-resident frame and fixes
the residual offset with dynamic lane/sublane rotations.

Mosaic constraints that shaped this design (each cost an attempt in r1/r2):
- DMA starts along the sublane dim must be tile-aligned (8 for f32, 32 for
  uint8) and along the lane dim 128-aligned -> DMA from a rounded-down,
  clipped base and realign with ``pltpu.roll`` (dynamic shifts ARE supported
  on both axes; plain negative Python shifts are not - use ``(-d) % size``).
- Rank-4 channels-last canvases put C(=1) in the lane dim, which Mosaic
  rejects for DMA -> operate on (B, H, W) with W in lanes (C==1 fast path).
- Static slices with small unaligned offsets are rejected -> take the four
  bilinear taps via static rolls and a single [:ch, :cw] slice at offset 0.
- Out-of-image taps: rolls wrap within the scratch window; a global
  row/col-coordinate mask zeroes every tap whose source pixel lies outside
  the image (same zeros the XLA path produces via clamp+roll+mask).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _roundup(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _sublane_align(dtype) -> int:
    """DMA start alignment along the second-to-last dim for this dtype."""
    if dtype == jnp.uint8 or dtype == jnp.int8:
        return 32
    if dtype == jnp.bfloat16 or dtype == jnp.float16:
        return 16
    return 8


def _crop_kernel(
    bi_ref,
    yd_ref,
    xd_ref,
    fx_ref,
    fy_ref,
    canvas_ref,
    out_ref,
    scratch,
    sem,
    *,
    H: int,
    W: int,
    ch: int,
    cw: int,
    wh: int,
    ww: int,
    y_align: int,
):
    i = pl.program_id(0)
    bi = bi_ref[i]
    yd = yd_ref[i]
    xd = xd_ref[i]

    ybase = (jnp.clip(yd, 0, H - wh) // y_align) * y_align
    xbase = (jnp.clip(xd, 0, W - ww) // 128) * 128
    dy = yd - ybase  # in (-wh, wh); window sizes guarantee no in-bounds wrap
    dx = xd - xbase

    copy = pltpu.make_async_copy(
        canvas_ref.at[bi, pl.ds(ybase, wh), pl.ds(xbase, ww)], scratch, sem
    )
    copy.start()
    copy.wait()

    patch = scratch[...]
    if patch.dtype == jnp.uint8:
        patch = patch.astype(jnp.int32)  # no direct uint8->f32 in Mosaic
    patch = patch.astype(jnp.float32)

    # Realign so patch[r, c] holds pixel (yd + r, xd + c); wrapped taps are
    # zeroed by the global-coordinate mask.
    patch = pltpu.roll(patch, (-dy) % wh, 0)
    patch = pltpu.roll(patch, (-dx) % ww, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 1)
    gy = yd + rows
    gx = xd + cols
    valid = (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)
    patch = jnp.where(valid, patch, 0.0)

    # 2x2 fractional blend; taps via static rolls (offset-1 static slices are
    # rejected by Mosaic layout inference).
    p01 = pltpu.roll(patch, ww - 1, 1)  # p01[r, c] = patch[r, c+1]
    p10 = pltpu.roll(patch, wh - 1, 0)  # p10[r, c] = patch[r+1, c]
    p11 = pltpu.roll(p10, ww - 1, 1)
    fx = fx_ref[i]
    fy = fy_ref[i]
    top = patch * (1.0 - fx) + p01 * fx
    bot = p10 * (1.0 - fx) + p11 * fx
    res = top * (1.0 - fy) + bot * fy
    out_ref[0] = res[:ch, :cw]


def crop_window_shape(crop_size: Tuple[int, int], dtype) -> Tuple[int, int]:
    """DMA window (wh, ww) for a crop: rounded up so the residual alignment
    roll can never wrap an in-bounds tap back into the visible region."""
    ch, cw = crop_size
    y_align = _sublane_align(dtype)
    return _roundup(ch + y_align, y_align), _roundup(cw + 128, 128)


def crop_bboxes_unit_pallas_ok(images_shape, crop_size, dtype) -> bool:
    """Whether the Mosaic crop kernel can serve this call."""
    if not _HAS_PLTPU:
        return False
    ch, cw = crop_size
    if ch % 8 != 0 or cw % 128 != 0:
        return False  # output block tiling
    H, W, C = images_shape[1], images_shape[2], images_shape[3]
    if C != 1:
        return False  # W must be the lane dim
    wh, ww = crop_window_shape(crop_size, dtype)
    y_align = _sublane_align(dtype)
    return H >= wh and W >= ww and H % y_align == 0 and W % 128 == 0


@functools.partial(jax.jit, static_argnames=("crop_size", "interpret"))
def crop_bboxes_unit_pallas(
    images: jnp.ndarray,
    top_left: jnp.ndarray,
    box_indices: jnp.ndarray,
    crop_size: Tuple[int, int],
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for :func:`crop_bboxes_unit` (same args/semantics), C==1."""
    ch, cw = crop_size
    B, H, W, C = images.shape
    assert C == 1, "Pallas crop kernel is single-channel; gate via _ok()."
    canvas = images[..., 0]  # (B, H, W): W in lanes
    wh, ww = crop_window_shape(crop_size, images.dtype)
    y_align = _sublane_align(images.dtype)

    x1 = top_left[:, 0]
    y1 = top_left[:, 1]
    x0 = jnp.floor(x1)
    y0 = jnp.floor(y1)
    fx = (x1 - x0).astype(jnp.float32)
    fy = (y1 - y0).astype(jnp.float32)
    yd = y0.astype(jnp.int32)
    xd = x0.astype(jnp.int32)
    n = top_left.shape[0]

    kernel = functools.partial(
        _crop_kernel, H=H, W=W, ch=ch, cw=cw, wh=wh, ww=ww, y_align=y_align
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, ch, cw), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((wh, ww), images.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, ch, cw), jnp.float32),
        interpret=interpret,
    )(box_indices.astype(jnp.int32), yd, xd, fx, fy, canvas)
    return out[..., None]
