"""Class-identity grouping ops (JAX, on-chip).

Rebuild of ``/root/reference/sleap/nn/identity.py`` (``group_class_peaks:13``,
``classify_peaks_from_maps:97``, ``classify_peaks_from_vectors:182``). The
reference loops samples x channels in Python with a scipy Hungarian per cell;
here the peaks arrive in the static (S, C, K) layout so class assignment is
one batched LAP over (S*C, N, N) padded matrices, fully on-chip.

Semantics preserved: peaks are matched to classes by Hungarian assignment on
class probability, then matches where the assigned class is not the peak's
argmax class are dropped (identity.py:86-94).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sleap_tpu.ops.lap import PAD_COST, batched_solve_lap


def _assign_classes(
    probs: jnp.ndarray, peak_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hungarian class assignment for one group of peaks.

    Args:
        probs: (B, K, n_classes) class probabilities per peak.
        peak_mask: (B, K) peak validity.

    Returns:
        peak_for_class: (B, n_classes) int index of the peak assigned to each
            class (may point anywhere when invalid).
        valid: (B, n_classes) bool — assignment exists, peak is valid, and the
            class is the argmax class of that peak.
    """
    B, K, n_classes = probs.shape
    N = max(K, n_classes)
    cost = jnp.full((B, N, N), PAD_COST, jnp.float32)
    neg = jnp.where(peak_mask[..., None], -probs, PAD_COST)
    neg = jnp.nan_to_num(neg, nan=PAD_COST)
    cost = cost.at[:, :K, :n_classes].set(neg)
    col4row, row4col = batched_solve_lap(cost)  # row=peak, col=class
    peak_for_class = row4col[:, :n_classes]  # (B, n_classes)

    pfc = jnp.clip(peak_for_class, 0, K - 1)
    matched_prob = jnp.take_along_axis(
        probs, pfc[:, :, None], axis=1
    )  # (B, n_classes, n_classes) -> diag
    matched_prob = jnp.take_along_axis(
        matched_prob, jnp.arange(n_classes)[None, :, None], axis=2
    )[..., 0]
    best_prob = jnp.max(
        jnp.take_along_axis(probs, pfc[:, :, None].repeat(n_classes, -1), axis=1),
        axis=-1,
    )
    valid = (
        (peak_for_class >= 0)
        & (peak_for_class < K)
        & jnp.take_along_axis(peak_mask, pfc, axis=1)
        & (matched_prob == best_prob)
        & jnp.isfinite(matched_prob)
    )
    return pfc, valid & (matched_prob > -jnp.inf)


def classify_peaks_from_maps(
    class_maps: jnp.ndarray,
    peaks: jnp.ndarray,
    peak_vals: jnp.ndarray,
    peak_mask: jnp.ndarray,
    class_maps_stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Group peaks into identities by sampling class maps at peak locations.

    Args:
        class_maps: (S, H', W', n_classes) at stride ``class_maps_stride``.
        peaks: (S, C, K, 2) xy in image scale (NaN-padded).
        peak_vals / peak_mask: (S, C, K).

    Returns:
        points: (S, n_classes, C, 2); point_vals / class_probs: (S, n_classes, C).
    """
    S, Hs, Ws, n_classes = class_maps.shape
    C, K = peaks.shape[1], peaks.shape[2]

    cols = jnp.round(jnp.nan_to_num(peaks[..., 0]) / class_maps_stride).astype(jnp.int32)
    rows = jnp.round(jnp.nan_to_num(peaks[..., 1]) / class_maps_stride).astype(jnp.int32)
    cols = jnp.clip(cols, 0, Ws - 1)
    rows = jnp.clip(rows, 0, Hs - 1)
    flat = rows * Ws + cols  # (S, C, K)
    cm_flat = class_maps.reshape(S, Hs * Ws, n_classes)
    probs = jax.vmap(lambda cm, idx: cm[idx])(cm_flat, flat.reshape(S, -1))
    probs = probs.reshape(S, C, K, n_classes)

    pfc, valid = _assign_classes(
        probs.reshape(S * C, K, n_classes), peak_mask.reshape(S * C, K)
    )
    pfc = pfc.reshape(S, C, n_classes)
    valid = valid.reshape(S, C, n_classes)

    # points[s, class, c] = peaks[s, c, pfc[s, c, class]]
    pts = jnp.take_along_axis(
        peaks, pfc[:, :, :, None].reshape(S, C, n_classes, 1).repeat(2, -1), axis=2
    )  # (S, C, n_classes, 2)
    vals = jnp.take_along_axis(peak_vals, pfc, axis=2)  # (S, C, n_classes)
    matched_probs = jnp.take_along_axis(
        probs, pfc[..., None], axis=2
    )  # (S, C, n_classes, n_classes)
    matched_probs = jnp.take_along_axis(
        matched_probs, jnp.arange(n_classes).reshape(1, 1, -1, 1), axis=3
    )[..., 0]

    pts = jnp.where(valid[..., None], pts, jnp.nan)
    vals = jnp.where(valid, vals, jnp.nan)
    matched_probs = jnp.where(valid, matched_probs, jnp.nan)

    # (S, C, n_classes, ...) -> (S, n_classes, C, ...)
    return (
        jnp.transpose(pts, (0, 2, 1, 3)),
        jnp.transpose(vals, (0, 2, 1)),
        jnp.transpose(matched_probs, (0, 2, 1)),
    )


def classify_peaks_from_vectors(
    peaks: jnp.ndarray,
    peak_vals: jnp.ndarray,
    class_probs: jnp.ndarray,
    peak_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Group cropped-instance peaks into identities via class vectors.

    Args:
        peaks: (S, K, C, 2) per-crop peaks (K crops per sample, C nodes).
        peak_vals: (S, K, C).
        class_probs: (S, K, n_classes) softmax outputs per crop.
        peak_mask: (S, K) crop validity.

    Returns:
        points: (S, n_classes, C, 2); point_vals / probs: (S, n_classes, C).
    """
    S, K, C, _ = peaks.shape
    n_classes = class_probs.shape[-1]
    pfc, valid = _assign_classes(class_probs, peak_mask)  # (S, n_classes)

    pts = jnp.take_along_axis(
        peaks, pfc[:, :, None, None].repeat(C, 2).repeat(2, 3), axis=1
    )  # (S, n_classes, C, 2)
    vals = jnp.take_along_axis(peak_vals, pfc[:, :, None].repeat(C, 2), axis=1)
    probs = jnp.take_along_axis(class_probs, pfc[..., None], axis=1)
    probs = jnp.take_along_axis(probs, jnp.arange(n_classes).reshape(1, -1, 1), axis=2)[
        ..., 0
    ]

    pts = jnp.where(valid[:, :, None, None], pts, jnp.nan)
    vals = jnp.where(valid[:, :, None], vals, jnp.nan)
    probs_full = jnp.broadcast_to(probs[:, :, None], (S, n_classes, C))
    probs_full = jnp.where(valid[:, :, None], probs_full, jnp.nan)
    return pts, vals, probs_full
