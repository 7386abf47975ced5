"""EXPERIMENTAL Pallas crop kernel (correct in interpret mode; TPU lowering
still blocked).

Goal: replace the vmapped ``dynamic_slice`` crops (which serialize on TPU)
with per-program async DMA + fractional blend. Findings so far (kept for the
next attempt):

- DMA starts/sizes along the sublane (W) dim must be 8-aligned; handled by
  rounding starts down and an 8-way ``lax.switch`` over static slices for
  the residual (static unaligned sublane slices ARE supported; dynamic are
  not).
- Remaining blocker: with channels-last rank-4 canvases the LANE dim is
  C (=1 for grayscale), and Mosaic rejects DMA slices whose lane dim is
  neither 128-aligned nor... even the full size-1 dim. A working design
  probably needs the canvas flattened to (B, H, W) with W as lanes, full-row
  DMAs, and a masked lane *rotation* for the [0, 128) residual offset.

Production code uses :func:`sleap_tpu.ops.peak_finding.crop_bboxes_unit`.
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


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _crop_kernel(bi_ref, ys_ref, xs_ref, fx_ref, fy_ref, canvas_ref, out_ref,
                 scratch_ref, sem):
    i = pl.program_id(0)
    bi = bi_ref[i]
    ys = ys_ref[i]
    xs = xs_ref[i]
    crop_h = out_ref.shape[1]
    crop_w = out_ref.shape[2]
    # DMA starts and sizes must be 8-aligned in the sublane (W) dim: round
    # the start down to 8 and fetch a larger window; the residual offset is
    # applied with a dynamic in-VMEM slice below.
    wh = _round8(crop_h + 1) + 8
    ww = _round8(crop_w + 1) + 8
    ys8 = (ys // 8) * 8
    xs8 = (xs // 8) * 8
    ry = ys - ys8
    rx = xs - xs8

    dma = pltpu.make_async_copy(
        canvas_ref.at[bi, pl.ds(ys8, wh), pl.ds(xs8, ww), :],
        scratch_ref,
        sem,
    )
    dma.start()
    dma.wait()

    # H (untiled) residual: dynamic slice. W (sublane) residual: 8-way switch
    # over static slices (dynamic sublane slicing is unsupported in Mosaic).
    patch_y = scratch_ref[pl.ds(ry, crop_h + 1)]
    patch = jax.lax.switch(
        rx, [lambda r=r: patch_y[:, r : r + crop_w + 1, :] for r in range(8)]
    )
    # Mosaic has no direct uint8 -> f32 cast; hop through int32.
    if patch.dtype == jnp.uint8:
        patch = patch.astype(jnp.int32)
    patch = patch.astype(jnp.float32)  # (crop+1, crop+1, C)
    fx = fx_ref[i]
    fy = fy_ref[i]
    top = patch[:-1, :-1] * (1 - fx) + patch[:-1, 1:] * fx
    bot = patch[1:, :-1] * (1 - fx) + patch[1:, 1:] * fx
    out_ref[0] = top * (1 - fy) + bot * fy


@functools.partial(jax.jit, static_argnames=("crop_size", "interpret"))
def crop_bboxes_unit_pallas(
    images: jnp.ndarray,
    top_left: jnp.ndarray,
    box_indices: jnp.ndarray,
    crop_size: Tuple[int, int],
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for :func:`crop_bboxes_unit` (same args/semantics)."""
    crop_h, crop_w = crop_size
    H, W, C = images.shape[1], images.shape[2], images.shape[3]
    pad_h, pad_w = ((crop_h + 8) // 8) * 8 + 16, ((crop_w + 8) // 8) * 8 + 16
    padded = jnp.pad(images, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))

    x1 = top_left[:, 0]
    y1 = top_left[:, 1]
    x0 = jnp.floor(x1)
    y0 = jnp.floor(y1)
    fx = (x1 - x0).astype(jnp.float32)
    fy = (y1 - y0).astype(jnp.float32)
    ys = jnp.clip(y0.astype(jnp.int32) + pad_h, 0, H + pad_h)
    xs = jnp.clip(x0.astype(jnp.int32) + pad_w, 0, W + pad_w)
    n = top_left.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, crop_h, crop_w, C), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (((crop_h + 8) // 8) * 8 + 8, ((crop_w + 8) // 8) * 8 + 8, C),
                images.dtype,
            ),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _crop_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, crop_h, crop_w, C), jnp.float32),
        interpret=interpret,
    )(
        box_indices.astype(jnp.int32), ys, xs, fx, fy, padded
    )
    return out
