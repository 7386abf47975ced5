"""Training losses.

Rebuild of ``/root/reference/sleap/nn/losses.py`` (``compute_ohkm_loss:7``,
``OHKMLoss:54``, ``PartLoss:113``): base loss is MSE on confidence maps;
online hard keypoint mining rescales the top-K worst-channel losses.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def mse_loss(y_gt: jnp.ndarray, y_pr: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over all elements (Keras 'mse' semantics)."""
    return jnp.mean(jnp.square(y_gt - y_pr))


def compute_ohkm_loss(
    y_gt: jnp.ndarray,
    y_pr: jnp.ndarray,
    hard_to_easy_ratio: float = 2.0,
    min_hard_keypoints: int = 2,
    max_hard_keypoints: Optional[int] = None,
    loss_scale: float = 5.0,
) -> jnp.ndarray:
    """Online hard keypoint mining loss (reference losses.py:7-51).

    Channelwise MSE is computed; channels whose loss exceeds
    ``hard_to_easy_ratio`` x the easiest channel's loss are "hard" (with
    min/max bounds on the count) and their mean loss is scaled by
    ``loss_scale`` and added.
    """
    n_channels = y_gt.shape[-1]
    # Channelwise MSE: mean over batch and spatial dims.
    ch_losses = jnp.mean(
        jnp.square(y_gt - y_pr), axis=tuple(range(y_gt.ndim - 1))
    )  # (channels,)
    easy = jnp.min(ch_losses)
    is_hard = ch_losses > (easy * hard_to_easy_ratio)
    n_hard = jnp.sum(is_hard.astype(jnp.int32))
    k = jnp.maximum(n_hard, min_hard_keypoints)
    if max_hard_keypoints is not None:
        k = jnp.minimum(k, max_hard_keypoints)
    k = jnp.minimum(k, n_channels)

    sorted_losses = jnp.sort(ch_losses)[::-1]  # descending
    mask = jnp.arange(n_channels) < k
    hard_loss = jnp.sum(jnp.where(mask, sorted_losses, 0.0)) / jnp.maximum(
        k.astype(jnp.float32), 1.0
    )
    return hard_loss * loss_scale


def categorical_crossentropy(y_gt: jnp.ndarray, y_pr: jnp.ndarray) -> jnp.ndarray:
    """Mean categorical cross-entropy over softmax outputs."""
    eps = 1e-7
    return -jnp.mean(jnp.sum(y_gt * jnp.log(jnp.clip(y_pr, eps, 1.0)), axis=-1))
