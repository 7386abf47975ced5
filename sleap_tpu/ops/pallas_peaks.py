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
import os
from typing import Optional, Tuple

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


def _resolve_peaks_sw() -> int:
    """W-segment width for the (H, W, C, S) streaming kernel's A/B knob.

    Resolved ONCE at import (NOT at trace time: the jitted kernel builder
    does not key its cache on the env var, so a mid-process flip would
    silently hit a stale trace). Values must be multiples of 16: the kernel
    stages SW//2 pooled candidates and inserts them in fori chunks of 8, so
    any SW with (SW//2) % 8 != 0 would silently drop candidates, and odd SW
    crashes the 2x2 pool reshape. Invalid values fall back to 32 loudly.
    """
    raw = os.environ.get("SLEAP_TPU_PEAKS_SW", "32")
    try:
        sw = int(raw)
    except ValueError:
        sw = -1
    if sw <= 0 or sw % 16 != 0:
        if raw != "32":
            import warnings

            warnings.warn(
                f"SLEAP_TPU_PEAKS_SW={raw!r} invalid (need a positive "
                "multiple of 16); falling back to 32"
            )
        return 32
    return sw


_PEAKS_SW = _resolve_peaks_sw()


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


def _hwcs_kernel(
    x0_ref,  # rows (4t .. 4t+3) of (H, W, C, Sb)
    keys_ref,  # (K, C, Sb) int32 out: packed keys, descending
    dx_ref,  # (K, C, Sb) f32 out: integral dx offsets
    dy_ref,  # (K, C, Sb) f32 out
    ring_ref,  # (4, W, C, Sb) bf16 scratch: the PREVIOUS input block
    keys_s,  # (SW//2, C, Sb) int32 scratch: staged pooled candidates
    dxs_s,  # (SW//2, C, Sb) f32 scratch
    dys_s,  # (SW//2, C, Sb) f32 scratch
    *,
    H: int,
    SW: int,
    threshold: float,
    k_peaks: int,
    refine: bool,
):
    """Streaming local-peaks kernel over logical (H, W, C, S) maps.

    This layout is the conv head's PREFERRED physical output layout on TPU
    ({0,1,3,2} of (S, C, H, W)), so consuming it directly lets XLA fold the
    head->peaks transpose into a bitcast — the (S, C, H, W)-consuming kernels
    force a full relayout copy of the maps (~3.3 ms at the bottom-up bench
    config). Channels sit in sublanes and batch in lanes, so all H/W-direction
    work (NMS neighbor compares, the 5-tap separable refinement sums, 2x2
    pooling) is pure elementwise vector math over (C, Sb) tiles — no
    intra-register rolls at all, unlike the (maps, H, W) kernels.

    Structure per grid step t (grid is (S/Sb, H/4 + 1), h innermost):
      - rows 4t-4..4t+3 are available: the current 4-row block plus the
        previous block kept verbatim in a statically-indexed VMEM ring.
        Rows outside [0, H) are zeroed — exact border semantics for both NMS
        (any candidate exceeds 0 since threshold > 0) and the zero-padded
        integral window.
      - two row PAIRS are completed with lag 2: (4t-2, 4t-1) when t > 0 and
        (4t, 4t+1) except on the tail step. Completion = NMS against the
        already-available neighbor rows, values packed into int32 sort keys
        (bf16-value-bits << 16 | inverted linear index — same
        value-then-first-occurrence order as ``_local_peaks_kernel_packed``),
        and the integral numerators/denominator formed by separable 5-tap
        sums (telescoped column sums over rows, then shifted row sums via a
        2-col halo; W is processed in SW-wide segments to bound Mosaic's
        VMEM value stack).
      - a 2x2 max-pool merges each row pair: NMS survivors are never
        8-adjacent, so each 2x2 cell holds at most ONE survivor — the pool
        is lossless for peaks (the reason K extraction can run at 1/4 rate).
      - pooled candidates (keys + dx/dy satellites) are staged to VMEM and
        bubble-inserted into a register-carried sorted top-K persisted in
        the output refs.
    """
    W = x0_ref.shape[1]
    C, Sb = x0_ref.shape[2], x0_ref.shape[3]
    t = pl.program_id(1)
    n_steps = pl.num_programs(1)
    neg_inf = jnp.float32(-jnp.inf)
    int_min = jnp.int32(-(2**31))

    @pl.when(t == 0)
    def _init():
        keys_ref[...] = jnp.full(keys_ref.shape, int_min, jnp.int32)
        dx_ref[...] = jnp.zeros(dx_ref.shape, jnp.float32)
        dy_ref[...] = jnp.zeros(dy_ref.shape, jnp.float32)

    # Row accessor: j relative to 4t (j in -4..3); ring slots are STATIC
    # (the ring is simply last step's block). Rows outside [0, H) read as
    # zero via a select (ring garbage at the borders may be NaN/inf).
    def seg_row(j, lo):
        full = x0_ref[j] if j >= 0 else ring_ref[4 + j]
        r = 4 * t + j
        valid = (r >= 0) & (r < H) if j < 0 else (r < H)
        a = max(lo - 2, 0)
        b = min(lo + SW + 2, W)
        x = full[a:b].astype(jnp.float32)
        x = jnp.where(valid, x, jnp.zeros_like(x))
        pads = []
        if a > lo - 2:
            pads.append(jnp.zeros((a - (lo - 2), C, Sb), jnp.float32))
        pads.append(x)
        if b < lo + SW + 2:
            pads.append(jnp.zeros((lo + SW + 2 - b, C, Sb), jnp.float32))
        return jnp.concatenate(pads, 0) if len(pads) > 1 else pads[0]

    def insert_staged(n_cand):
        # Bubble-insert staged pooled candidates into the sorted top-K that
        # lives in the output refs (they persist across grid steps).
        state = []
        for j in range(k_peaks):
            state.extend([keys_ref[j], dx_ref[j], dy_ref[j]])
        UNROLL = 8

        def body(i, carry):
            st = list(carry)
            for u in range(UNROLL):
                idx = i * UNROLL + u
                kc = keys_s[idx]
                dxc = dxs_s[idx]
                dyc = dys_s[idx]
                for j in range(k_peaks):
                    kj, dxj, dyj = st[3 * j], st[3 * j + 1], st[3 * j + 2]
                    swap = kc > kj
                    st[3 * j] = jnp.where(swap, kc, kj)
                    st[3 * j + 1] = jnp.where(swap, dxc, dxj)
                    st[3 * j + 2] = jnp.where(swap, dyc, dyj)
                    kc = jnp.where(swap, kj, kc)
                    dxc = jnp.where(swap, dxj, dxc)
                    dyc = jnp.where(swap, dyj, dyc)
            return tuple(st)

        state = jax.lax.fori_loop(0, n_cand // UNROLL, body, tuple(state))
        for j in range(k_peaks):
            keys_ref[j] = state[3 * j]
            dx_ref[j] = state[3 * j + 1]
            dy_ref[j] = state[3 * j + 2]

    def process_pair(ja):
        # Complete rows (4t+ja, 4t+ja+1); ja in {-2, 0}.
        for lo in range(0, W, SW):
            rows = {j: seg_row(j, lo) for j in range(ja - 2, ja + 4)}
            c_a, c_b = rows[ja], rows[ja + 1]

            def ctr(x):
                return x[2 : 2 + SW]

            def lr(x):
                return jnp.maximum(x[1 : 1 + SW], x[3 : 3 + SW])

            lr_a, lr_b = lr(c_a), lr(c_b)
            cm3_a = jnp.maximum(lr_a, ctr(c_a))
            cm3_b = jnp.maximum(lr_b, ctr(c_b))
            cm3_up = jnp.maximum(lr(rows[ja - 1]), ctr(rows[ja - 1]))
            cm3_dn = jnp.maximum(lr(rows[ja + 2]), ctr(rows[ja + 2]))

            w_iota = jax.lax.broadcasted_iota(jnp.int32, (SW, C, Sb), 0) + lo

            def pack(cmc, lr_x, above, below, odd):
                nbr = jnp.maximum(jnp.maximum(above, below), lr_x)
                is_peak = (cmc > nbr) & (cmc > threshold)
                masked = jnp.where(is_peak, cmc, neg_inf)
                bits = jax.lax.bitcast_convert_type(masked, jnp.int32)
                r = 4 * t + ja + odd
                inv = (jnp.int32(H * W - 1) - r * W) - w_iota
                return ((bits >> 16) << 16) | inv

            key_a = pack(ctr(c_a), lr_a, cm3_up, cm3_b, 0)
            key_b = pack(ctr(c_b), lr_b, cm3_a, cm3_dn, 1)

            if refine:
                # Separable 5-tap integral window: telescoped column sums
                # over rows, then shifted row sums via the halo.
                tcol_a = (rows[ja - 2] + rows[ja - 1] + c_a + c_b
                          + rows[ja + 2])
                tcol_b = tcol_a + rows[ja + 3] - rows[ja - 2]
                scol_a = 2.0 * (rows[ja + 2] - rows[ja - 2]) + (
                    c_b - rows[ja - 1])
                scol_b = 2.0 * (rows[ja + 3] - rows[ja - 1]) + (
                    rows[ja + 2] - c_a)

                def xsums(tcol, scol):
                    z = (tcol[0:SW] + tcol[1 : SW + 1] + tcol[2 : SW + 2]
                         + tcol[3 : SW + 3] + tcol[4 : SW + 4])
                    mx = (tcol[3 : SW + 3] - tcol[1 : SW + 1]) + 2.0 * (
                        tcol[4 : SW + 4] - tcol[0:SW])
                    my = (scol[0:SW] + scol[1 : SW + 1] + scol[2 : SW + 2]
                          + scol[3 : SW + 3] + scol[4 : SW + 4])
                    return z, mx, my

                z_a, mx_a, my_a = xsums(tcol_a, scol_a)
                z_b, mx_b, my_b = xsums(tcol_b, scol_b)
            else:
                zero = jnp.zeros((SW, C, Sb), jnp.float32)
                z_a = mx_a = my_a = z_b = mx_b = my_b = zero

            # ---- 2x2 pool (W pairs within each row, then the row pair) ----
            def wpool(key, z, mx, my):
                k2 = key.reshape(SW // 2, 2, C, Sb)
                k0, k1 = k2[:, 0], k2[:, 1]
                take0 = k0 >= k1
                kp = jnp.maximum(k0, k1)

                def sel(v):
                    v2 = v.reshape(SW // 2, 2, C, Sb)
                    return jnp.where(take0, v2[:, 0], v2[:, 1])

                return kp, sel(z), sel(mx), sel(my)

            ka, za, mxa, mya = wpool(key_a, z_a, mx_a, my_a)
            kb, zb, mxb, myb = wpool(key_b, z_b, mx_b, my_b)
            take_a = ka >= kb
            kp = jnp.maximum(ka, kb)
            zp = jnp.where(take_a, za, zb)
            mxp = jnp.where(take_a, mxa, mxb)
            myp = jnp.where(take_a, mya, myb)

            keys_s[...] = kp
            if refine:
                rz = 1.0 / zp  # one exact divide, two muls
                dxs_s[...] = mxp * rz
                dys_s[...] = myp * rz
            else:
                zero_p = jnp.zeros((SW // 2, C, Sb), jnp.float32)
                dxs_s[...] = zero_p
                dys_s[...] = zero_p

            insert_staged(SW // 2)

    @pl.when(t > 0)
    def _pair1():
        process_pair(-2)

    @pl.when(t < n_steps - 1)
    def _pair2():
        process_pair(0)

    # Ring update LAST (every step): keep the whole current block for the
    # next step's rows 4(t+1)-4 .. 4(t+1)-1. Tail-step garbage (clamped
    # block) is written but never read.
    for i in range(4):
        ring_ref[i] = x0_ref[i]


def local_peaks_hwcs_ok(
    shape: Tuple[int, ...],
    dtype,
    threshold: float,
    integral_patch_size: int,
) -> bool:
    """Whether the (H, W, C, S)-layout streaming kernel can serve this call."""
    if not _HAS_PLTPU:
        return False
    H, W, C, S = shape
    if dtype != jnp.bfloat16 or H * W > 2**16 or threshold <= 0.0:
        return False  # 16-bit value/index packing preconditions
    if integral_patch_size != 5:
        return False  # the separable window is hard-wired to 5 taps
    if H % 4 != 0 or W % 16 != 0:
        return False  # 4-row blocks / row-pair pooling; W//2 unroll of 8
    sb = _pick_sb(S)
    return sb is not None


def _pick_sb(S: int) -> Optional[int]:
    for sb in (128, 64, 32, 16, 8, 4, 2, 1):
        if S % sb == 0:
            return sb
    return None


@functools.partial(
    jax.jit,
    static_argnames=("max_peaks", "threshold", "refine", "interpret"),
)
def find_local_peaks_fused_pallas_hwcs(
    maps_hwcs: jnp.ndarray,
    max_peaks: int = 8,
    threshold: float = 0.2,
    refine: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused local peaks over logical (H, W, C, S) confidence maps.

    Same contract as :func:`find_local_peaks_fused_pallas` but indexed
    (channels, samples): feeding ``jnp.transpose(cms_nhwc, (1, 2, 3, 0))``
    costs NO relayout — (H, W, C, S)-standard is the physical layout the TPU
    conv emitters already prefer for NHWC conv outputs (verified: the
    transpose folds to a bitcast and the pre-kernel copy disappears from the
    compiled HLO; see CLAUDE.md round-4 notes).

    Returns:
        peaks: (S, C, max_peaks, 2) xy, integral-refined when ``refine``;
            garbage in invalid slots (mask with ``vals``).
        vals: (S, C, max_peaks) peak values, -inf in invalid slots.
    """
    H, W, C, S = maps_hwcs.shape
    sb = _pick_sb(S)
    # _PEAKS_SW is import-time resolved and validated (multiple of 16); the
    # W fallback is safe because local_peaks_hwcs_ok requires W % 16 == 0.
    SW = _PEAKS_SW if W % _PEAKS_SW == 0 else (32 if W % 32 == 0 else W)
    kernel = functools.partial(
        _hwcs_kernel,
        H=H,
        SW=SW,
        threshold=threshold,
        k_peaks=max_peaks,
        refine=refine,
    )
    vmem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None
    H4 = H // 4

    in_spec = pl.BlockSpec(
        (4, W, C, sb),
        lambda s, h: (jnp.minimum(h, H4 - 1), 0, 0, s),
        memory_space=vmem,
    )
    out_spec = pl.BlockSpec(
        (max_peaks, C, sb), lambda s, h: (0, 0, s), memory_space=vmem
    )
    out_shape = jax.ShapeDtypeStruct((max_peaks, C, S), jnp.float32)
    scratch = [
        pltpu.VMEM((4, W, C, sb), maps_hwcs.dtype),
        pltpu.VMEM((SW // 2, C, sb), jnp.int32),
        pltpu.VMEM((SW // 2, C, sb), jnp.float32),
        pltpu.VMEM((SW // 2, C, sb), jnp.float32),
    ] if _HAS_PLTPU else []
    keys, dx, dy = pl.pallas_call(
        kernel,
        grid=(S // sb, H4 + 1),
        in_specs=[in_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((max_peaks, C, S), jnp.int32),
            out_shape,
            out_shape,
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(maps_hwcs)

    # Decode: high 16 bits = value's bf16 bit pattern; low 16 = inverted
    # linear index; key <= 0 marks an empty slot (threshold > 0 guarantees
    # real peaks pack positive).
    keys = jnp.transpose(keys, (2, 1, 0))  # (S, C, K)
    dx = jnp.transpose(dx, (2, 1, 0))
    dy = jnp.transpose(dy, (2, 1, 0))
    vals = jax.lax.bitcast_convert_type((keys >> 16) << 16, jnp.float32)
    vals = jnp.where(keys > 0, vals, -jnp.inf)
    lin = jnp.int32(H * W - 1) - (keys & jnp.int32(0xFFFF))
    ys = (lin // W).astype(jnp.float32)
    xs = (lin % W).astype(jnp.float32)
    peaks = jnp.stack([xs + dx, ys + dy], axis=-1)
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
