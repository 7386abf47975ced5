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


def _local_peaks_kernel(
    cms_ref,
    x_ref,
    y_ref,
    v_ref,
    *,
    threshold: float,
    k_peaks: int,
    half: int,
    refine: bool,
):
    """Fused NMS + top-K extraction + integral refinement for one block of maps.

    Replaces the XLA chain in :func:`sleap_tpu.ops.peak_finding.find_local_peaks`
    (pad → 8 shifted maxes → masked flat top-k → vmapped patch gather), which
    costs ~7 ms in-context on bottom-up @1024² batch 8 (see CLAUDE.md): four HBM
    round trips over the 256² maps plus a sort-based ``lax.top_k``. Here each
    map is loaded into VMEM once; NMS runs as 8 masked ``pltpu.roll`` compares
    and the top-K extraction is K iterations of (max → min-linear-index →
    masked window sums → suppress), all on VMEM-resident data.

    Invalid peak slots (fewer than K peaks above threshold) write -inf to
    ``v_ref``; the wrapper converts to the NaN/0/mask contract.
    """
    H, W = cms_ref.shape[1], cms_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    lin = rows * W + cols
    neg_inf = jnp.float32(-jnp.inf)
    for k in range(cms_ref.shape[0]):
        cm = cms_ref[k].astype(jnp.float32)  # (H, W)

        # --- NMS: strictly greater than all 8 neighbors (border = -inf), ---
        # matching the reference's dilation2d trick (peak_finding.py:273-293).
        up = pltpu.roll(cm, H - 1, 0)  # up[y] = cm[y+1]   (roll needs shift >= 0)
        down = pltpu.roll(cm, 1, 0)  # down[y] = cm[y-1]
        nbr = neg_inf
        for dy, base in ((-1, down), (0, cm), (1, up)):
            row_ok = (rows + dy >= 0) & (rows + dy < H)
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                if dx == 0:
                    s = base
                    ok = row_ok
                else:
                    s = pltpu.roll(base, (-dx) % W, 1)
                    ok = row_ok & (cols + dx >= 0) & (cols + dx < W)
                nbr = jnp.maximum(nbr, jnp.where(ok, s, neg_inf))
        masked = jnp.where((cm > nbr) & (cm > threshold), cm, neg_inf)

        # --- iterative top-K extraction + integral refinement ---
        for j in range(k_peaks):
            peak_val = jnp.max(masked)
            m = jnp.min(jnp.where(masked == peak_val, lin, H * W))
            iy = m // W
            ix = m % W
            if refine:
                in_win = (jnp.abs(rows - iy) <= half) & (jnp.abs(cols - ix) <= half)
                w = jnp.where(in_win, cm, 0.0)
                z = jnp.sum(w)
                dx_hat = jnp.sum(w * (cols - ix).astype(jnp.float32)) / z
                dy_hat = jnp.sum(w * (rows - iy).astype(jnp.float32)) / z
                x = ix.astype(jnp.float32) + dx_hat
                y = iy.astype(jnp.float32) + dy_hat
            else:
                x = ix.astype(jnp.float32)
                y = iy.astype(jnp.float32)
            x_ref[k, j, 0] = x
            y_ref[k, j, 0] = y
            v_ref[k, j, 0] = peak_val
            masked = jnp.where(lin == m, neg_inf, masked)


def _local_peaks_kernel_banded(
    cms_ref,
    x_ref,
    y_ref,
    v_ref,
    masked_ref,
    *,
    threshold: float,
    k_peaks: int,
    half: int,
    refine: bool,
):
    """Banded top-K variant of :func:`_local_peaks_kernel`.

    The baseline kernel's top-K loop does ~4 full-(H, W) passes per peak
    (max, min-linear-index, refine sums, suppress) — ~32 passes for K=8,
    dominating the 4.3 ms/iter in-context cost @ (832, 256, 256). Here a
    per-row maximum (H, 1) is maintained incrementally: each iteration does
    one (H, 1) max + index, then operates on an 8-row sublane-ALIGNED band
    slice (the Mosaic alignment rule) for the column search, and a 16-row
    aligned window for integral refinement. Suppression is recorded as the
    K extracted linear indices and re-applied to band slices on the fly, so
    the (H, W) array is never rewritten. Only row ``iy``'s max changes per
    iteration, so the rowmax update is a single masked where.

    Mosaic cannot ``dynamic_slice`` VALUES, so the NMS-masked array is
    staged through a VMEM scratch (``masked_ref``) and band/window slices
    are ref loads with 8-aligned dynamic starts (the DMA alignment rule).
    """
    H, W = cms_ref.shape[1], cms_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
    brows = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
    bcols = jax.lax.broadcasted_iota(jnp.int32, (8, W), 1)
    wrows = jax.lax.broadcasted_iota(jnp.int32, (16, W), 0)
    # The NMS rolls must run in f32 (Mosaic: "Rotate with non-32-bit data"
    # is unimplemented for bf16), but the masked SCRATCH is stored in the
    # input dtype — exact for bf16 inputs (upcast/downcast of bf16-exact
    # values round-trips) — halving the scratch write + band-read traffic.
    dt = cms_ref.dtype
    neg_inf = jnp.float32(-jnp.inf)
    for k in range(cms_ref.shape[0]):
        cm = cms_ref[k].astype(jnp.float32)  # (H, W)

        # NMS: strictly greater than all 8 neighbors (border = -inf),
        # separably: 3-wide column-max (incl. center) rolled up/down covers
        # the rows above/below; left/right covers the center row — 4 rolls
        # instead of 10.
        left = pltpu.roll(cm, 1, 1)       # left[x]  = cm[x-1]
        right = pltpu.roll(cm, W - 1, 1)  # right[x] = cm[x+1]
        lr = jnp.maximum(
            jnp.where(cols >= 1, left, neg_inf),
            jnp.where(cols < W - 1, right, neg_inf),
        )
        colmax = jnp.maximum(cm, lr)      # 3-wide max INCLUDING center
        up = pltpu.roll(colmax, H - 1, 0)    # up[y]   = colmax[y+1]
        down = pltpu.roll(colmax, 1, 0)      # down[y] = colmax[y-1]
        nbr = jnp.maximum(
            jnp.maximum(
                jnp.where(rows < H - 1, up, neg_inf),
                jnp.where(rows >= 1, down, neg_inf),
            ),
            lr,
        )
        masked = jnp.where((cm > nbr) & (cm > threshold), cm, neg_inf)
        masked_ref[k] = masked.astype(dt)

        # Scalar bookkeeping stays f32 (Mosaic cannot squeeze bf16 scalars,
        # and the (H, 1) rowmax is tiny); exact since f32 embeds bf16.
        rowmax = jnp.max(masked, axis=1, keepdims=True).astype(jnp.float32)
        taken = []  # linear indices already extracted
        for j in range(k_peaks):
            peak_val = jnp.max(rowmax)
            iy = jnp.min(jnp.where(rowmax == peak_val, rows1, H))
            base8 = jnp.clip((iy // 8) * 8, 0, H - 8)
            # Load the 8-row band and upcast: the v5e VPU has no bf16
            # compares, so band math is f32; only scratch STORAGE is dt.
            band = masked_ref[k, pl.ds(pl.multiple_of(base8, 8), 8), :].astype(
                jnp.float32
            )
            band_rows = brows + base8
            band_lin = band_rows * W + bcols
            for m_prev in taken:
                band = jnp.where(band_lin == m_prev, neg_inf, band)
            hit = (band == peak_val) & (band_rows == iy)
            m = jnp.min(jnp.where(hit, band_lin, H * W))
            ix = m % W
            if refine:
                wbase = jnp.clip(((iy - half) // 8) * 8, 0, H - 16)
                win = cms_ref[
                    k, pl.ds(pl.multiple_of(wbase, 8), 16), :
                ].astype(jnp.float32)
                wr = wrows + wbase
                wcols = jax.lax.broadcasted_iota(jnp.int32, (16, W), 1)
                in_win = (jnp.abs(wr - iy) <= half) & (jnp.abs(wcols - ix) <= half)
                w = jnp.where(in_win, win, 0.0)
                z = jnp.sum(w)
                dx_hat = jnp.sum(w * (wcols - ix).astype(jnp.float32)) / z
                dy_hat = jnp.sum(w * (wr - iy).astype(jnp.float32)) / z
                x = ix.astype(jnp.float32) + dx_hat
                y = iy.astype(jnp.float32) + dy_hat
            else:
                x = ix.astype(jnp.float32)
                y = iy.astype(jnp.float32)
            x_ref[k, j, 0] = x
            y_ref[k, j, 0] = y
            v_ref[k, j, 0] = peak_val
            taken.append(m)
            # Only row iy's maximum changes; recompute it from the band.
            row_vals = jnp.where((band_rows == iy) & (band_lin != m), band, neg_inf)
            new_row_max = jnp.max(row_vals)
            rowmax = jnp.where(rows1 == iy, new_row_max, rowmax)


def _local_peaks_kernel_packed(
    cms_ref,
    x_ref,
    y_ref,
    v_ref,
    keys_ref,
    *,
    threshold: float,
    k_peaks: int,
    half: int,
    refine: bool,
):
    """Packed-key top-K variant of :func:`_local_peaks_kernel_banded`.

    For bf16 maps with ``H * W <= 2**16``, each NMS survivor packs EXACTLY
    into one int32 sort key: ``(f32_bits >> 16) << 16 | (65535 - lin)``.
    The high half is the value's bf16 bit pattern (monotone in value for
    positive floats — threshold > 0 guarantees positivity; -inf packs
    negative), the low half breaks ties toward the SMALLEST linear index —
    ``jnp.argmax``'s first-occurrence rule. One (H, 1) rowmax of keys then
    yields value AND position in a single reduction per extracted peak:
    the banded kernel's per-peak column search (band compare + min-index)
    and O(j) taken-list suppression collapse into scalar bit decodes plus
    one band write-back (keys are unique, so suppression is an exact
    compare). Measured ~2x faster than the banded kernel on the extraction
    phase at (3328, 256, 256) k=8 (see CLAUDE.md round-3 notes).
    """
    H, W = cms_ref.shape[1], cms_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
    brows = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
    bcols = jax.lax.broadcasted_iota(jnp.int32, (8, W), 1)
    wrows = jax.lax.broadcasted_iota(jnp.int32, (16, W), 0)
    neg_inf = jnp.float32(-jnp.inf)
    int_min = jnp.int32(-(2**31))
    for k in range(cms_ref.shape[0]):
        cm = cms_ref[k].astype(jnp.float32)  # (H, W)

        # Separable NMS (see _local_peaks_kernel_banded).
        left = pltpu.roll(cm, 1, 1)
        right = pltpu.roll(cm, W - 1, 1)
        lr = jnp.maximum(
            jnp.where(cols >= 1, left, neg_inf),
            jnp.where(cols < W - 1, right, neg_inf),
        )
        colmax = jnp.maximum(cm, lr)
        up = pltpu.roll(colmax, H - 1, 0)
        down = pltpu.roll(colmax, 1, 0)
        nbr = jnp.maximum(
            jnp.maximum(
                jnp.where(rows < H - 1, up, neg_inf),
                jnp.where(rows >= 1, down, neg_inf),
            ),
            lr,
        )
        masked = jnp.where((cm > nbr) & (cm > threshold), cm, neg_inf)

        # Pack: value bits (exact for bf16-origin f32) over inverted index.
        bits = jax.lax.bitcast_convert_type(masked, jnp.int32) >> 16
        keys = (bits << 16) | (jnp.int32(H * W - 1) - (rows * W + cols))
        keys_ref[k] = keys

        rowmax = jnp.max(keys, axis=1, keepdims=True)  # (H, 1) int32
        for j in range(k_peaks):
            best = jnp.max(rowmax)
            lin = jnp.int32(H * W - 1) - (best & jnp.int32(0xFFFF))
            iy = lin // W
            ix = lin % W
            if refine:
                wbase = jnp.clip(((iy - half) // 8) * 8, 0, H - 16)
                win = cms_ref[
                    k, pl.ds(pl.multiple_of(wbase, 8), 16), :
                ].astype(jnp.float32)
                wr = wrows + wbase
                wcols = jax.lax.broadcasted_iota(jnp.int32, (16, W), 1)
                in_win = (jnp.abs(wr - iy) <= half) & (jnp.abs(wcols - ix) <= half)
                w = jnp.where(in_win, win, 0.0)
                z = jnp.sum(w)
                dx_hat = jnp.sum(w * (wcols - ix).astype(jnp.float32)) / z
                dy_hat = jnp.sum(w * (wr - iy).astype(jnp.float32)) / z
                x = ix.astype(jnp.float32) + dx_hat
                y = iy.astype(jnp.float32) + dy_hat
            else:
                x = ix.astype(jnp.float32)
                y = iy.astype(jnp.float32)
            x_ref[k, j, 0] = x
            y_ref[k, j, 0] = y
            # Mosaic has no SCALAR bitcast, so emit the raw key; the wrapper
            # decodes value bits (and validity: key <= 0) vectorized in XLA.
            v_ref[k, j, 0] = best
            # Suppress the (unique) key in the scratch band and refresh the
            # one changed row maximum.
            base8 = jnp.clip((iy // 8) * 8, 0, H - 8)
            band = keys_ref[k, pl.ds(pl.multiple_of(base8, 8), 8), :]
            band = jnp.where(band == best, int_min, band)
            keys_ref[k, pl.ds(pl.multiple_of(base8, 8), 8), :] = band
            band_rows = brows + base8
            new_row_max = jnp.max(
                jnp.where(band_rows == iy, band, int_min)
            )
            rowmax = jnp.where(rows1 == iy, new_row_max, rowmax)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_peaks",
        "threshold",
        "integral_patch_size",
        "refine",
        "interpret",
    ),
)
def find_local_peaks_fused_pallas(
    maps: jnp.ndarray,
    max_peaks: int = 8,
    threshold: float = 0.2,
    integral_patch_size: int = 5,
    refine: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused local-peak finding over flat (n_maps, height, width) maps.

    Returns:
        peaks: (n_maps, max_peaks, 2) xy, refined when ``refine``; garbage in
            invalid slots (mask with ``vals``).
        vals: (n_maps, max_peaks) peak values, -inf in invalid slots.
    """
    n_maps, H, W = maps.shape
    n_pad = (-n_maps) % _BLOCK_MAPS
    if n_pad:
        maps = jnp.concatenate([maps, jnp.zeros((n_pad, H, W), maps.dtype)], axis=0)
    total = n_maps + n_pad
    half = (integral_patch_size - 1) // 2

    # Banded kernel needs >= 2 aligned 8-row bands (and half <= 6 so the
    # 16-row refinement window always covers the patch). The packed-key
    # variant additionally needs bf16 values (so the 16-bit key high half is
    # exact), a positive threshold (so valid keys are positive), and linear
    # indices that fit 16 bits.
    banded = _HAS_PLTPU and H >= 16 and H % 8 == 0 and half <= 6
    packed = (
        banded
        and maps.dtype == jnp.bfloat16
        and H * W <= 2**16
        and threshold > 0.0
    )
    kernel = functools.partial(
        _local_peaks_kernel_packed
        if packed
        else (_local_peaks_kernel_banded if banded else _local_peaks_kernel),
        threshold=threshold,
        k_peaks=max_peaks,
        half=half,
        refine=refine,
    )
    vmem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None
    smem = pltpu.SMEM if (_HAS_PLTPU and not interpret) else None
    out_spec = pl.BlockSpec(
        (_BLOCK_MAPS, max_peaks, 1), lambda i: (i, 0, 0), memory_space=smem
    )
    out_shape = jax.ShapeDtypeStruct((total, max_peaks, 1), jnp.float32)
    val_shape = (
        jax.ShapeDtypeStruct((total, max_peaks, 1), jnp.int32)
        if packed
        else out_shape
    )
    if packed and _HAS_PLTPU:
        scratch = [pltpu.VMEM((_BLOCK_MAPS, H, W), jnp.int32)]
    elif banded and _HAS_PLTPU:
        scratch = [pltpu.VMEM((_BLOCK_MAPS, H, W), maps.dtype)]
    else:
        scratch = []
    x, y, v = pl.pallas_call(
        kernel,
        grid=(total // _BLOCK_MAPS,),
        in_specs=[
            pl.BlockSpec((_BLOCK_MAPS, H, W), lambda i: (i, 0, 0), memory_space=vmem)
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, val_shape),
        scratch_shapes=scratch,
        interpret=interpret,
    )(maps)
    peaks = jnp.stack([x[:n_maps, :, 0], y[:n_maps, :, 0]], axis=-1)
    vals = v[:n_maps, :, 0]
    if packed:
        # Decode the packed keys: high 16 bits are the value's bf16/f32-top
        # bit pattern; key <= 0 marks an empty slot.
        decoded = jax.lax.bitcast_convert_type(
            (vals >> 16) << 16, jnp.float32
        )
        vals = jnp.where(vals > 0, decoded, -jnp.inf)
    return peaks, vals


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
