"""Pallas TPU kernel: fused global peak finding with integral refinement.

The XLA path (:func:`sleap_tpu.ops.peak_finding.find_global_peaks`) does a
transpose + flat argmax + padded patch extraction + weighted reduction — four
HBM round trips over the confidence maps. This kernel does the whole thing in
one pass: each grid program loads a block of 8 (height, width) confidence
maps into VMEM and computes max value, argmax location, and the 5x5
integral-regression offsets with masked window reductions, writing back three
scalars per map.

Numerics match the XLA path except at the image border: the XLA version
zero-pads patches that extend beyond the map, which is equivalent to the
masked window used here.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_BLOCK_MAPS = 8  # maps per grid program (second-to-last block dims need >= 8)


def _peak_kernel(cms_ref, xy_ref, val_ref, *, threshold: float, half: int):
    # _BLOCK_MAPS maps per program (statically unrolled) to amortize grid
    # overhead; each map's math stays rank-2 (Mosaic cannot flatten (B, H, W)
    # or relayout tiny squeezed shapes). Argmax is computed as "min linear
    # index where value == max" (first-occurrence ties, same as jnp.argmax);
    # scalar results go to SMEM (the documented Mosaic pattern).
    H, W = cms_ref.shape[1], cms_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    for k in range(cms_ref.shape[0]):
        cm = cms_ref[k].astype(jnp.float32)  # (H, W)
        peak_val = jnp.max(cm)
        lin = rows * W + cols
        m = jnp.min(jnp.where(cm == peak_val, lin, H * W))
        iy = m // W
        ix = m % W

        # Integral refinement over the (2*half+1)^2 window (masked at
        # borders - equivalent to the zero-padded patch of the XLA path).
        in_window = (jnp.abs(rows - iy) <= half) & (jnp.abs(cols - ix) <= half)
        w = jnp.where(in_window, cm, 0.0)
        z = jnp.sum(w)
        dx = jnp.sum(w * (cols - ix).astype(jnp.float32)) / z
        dy = jnp.sum(w * (rows - iy).astype(jnp.float32)) / z

        x = ix.astype(jnp.float32) + dx
        y = iy.astype(jnp.float32) + dy
        below = peak_val < threshold
        xy_ref[k, 0, 0] = jnp.where(below, jnp.nan, x)
        xy_ref[k, 1, 0] = jnp.where(below, jnp.nan, y)
        val_ref[k, 0, 0] = peak_val


@functools.partial(
    jax.jit, static_argnames=("threshold", "integral_patch_size", "interpret")
)
def find_global_peaks_integral_pallas(
    cms: jnp.ndarray,
    threshold: float = 0.2,
    integral_patch_size: int = 5,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused global peaks + integral refinement.

    Args:
        cms: (samples, height, width, channels) confidence maps.
        interpret: run the kernel in interpreter mode (CPU testing).

    Returns:
        peak_points: (samples, channels, 2) xy (NaN below threshold).
        peak_vals: (samples, channels).
    """
    S, H, W, C = cms.shape
    maps = jnp.transpose(cms, (0, 3, 1, 2)).reshape(S * C, H, W)
    n_maps = S * C
    n_pad = (-n_maps) % _BLOCK_MAPS
    if n_pad:
        maps = jnp.concatenate(
            [maps, jnp.zeros((n_pad, H, W), maps.dtype)], axis=0
        )
    total = n_maps + n_pad
    half = (integral_patch_size - 1) // 2

    kernel = functools.partial(_peak_kernel, threshold=threshold, half=half)
    vmem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None
    smem = pltpu.SMEM if (_HAS_PLTPU and not interpret) else None
    xy, vals = pl.pallas_call(
        kernel,
        grid=(total // _BLOCK_MAPS,),
        in_specs=[
            pl.BlockSpec((_BLOCK_MAPS, H, W), lambda i: (i, 0, 0), memory_space=vmem)
        ],
        out_specs=(
            pl.BlockSpec((_BLOCK_MAPS, 2, 1), lambda i: (i, 0, 0), memory_space=smem),
            pl.BlockSpec((_BLOCK_MAPS, 1, 1), lambda i: (i, 0, 0), memory_space=smem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((total, 2, 1), jnp.float32),
            jax.ShapeDtypeStruct((total, 1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(maps)
    return xy[:n_maps, :, 0].reshape(S, C, 2), vals[:n_maps, 0, 0].reshape(S, C)
