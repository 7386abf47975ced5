"""Generic encoder-decoder backbone (flax).

Rebuild of ``/root/reference/sleap/nn/architectures/encoder_decoder.py``
(``SimpleConvBlock:57``, ``SimpleUpsamplingBlock:186``,
``EncoderDecoder:403``). Architecture descriptions are *tagged plain tuples*
(JAX pytree flattening reconstructs tuple subclasses as plain tuples, so the
tag string — not the Python type — carries the block kind); one
``EncoderDecoderNet`` module executes any stack of them, collecting
stride-tagged intermediate features for skip connections and multi-stride
head attachment, exactly mirroring the reference's wiring:

- encoder: intermediate recorded after every block at each new stride; the
  deepest one is dropped (it's the encoder output itself).
- decoder: intermediate recorded *before* every block (so strides run from
  ``max_stride`` down to ``2 * output_stride``); skip sources are matched by
  the stride the block upsamples to.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sleap_tpu.models.common import IntermediateFeature

# --------------------------------------------------------------------------- #
# Block descriptor factories (tagged plain tuples)
# --------------------------------------------------------------------------- #


def SimpleConvBlock(
    pool: bool = True,
    pool_before_convs: bool = False,
    pooling_stride: int = 2,
    num_convs: int = 2,
    filters: int = 32,
    kernel_size: int = 3,
    use_bias: bool = True,
    batch_norm: bool = False,
    activation: str = "relu",
) -> tuple:
    """[pool] -> num_convs x (conv -> [BN] -> act) [-> pool]."""
    return (
        "simple_conv",
        pool,
        pool_before_convs,
        pooling_stride,
        num_convs,
        filters,
        kernel_size,
        use_bias,
        batch_norm,
        activation,
    )


def PoolingBlock(pool: bool = True, pooling_stride: int = 2) -> tuple:
    """Standalone max pool (UNet's trailing pool, unet.py:15)."""
    return ("pooling", pool, pooling_stride)


def StemBlock(
    pool: bool = True,
    pooling_stride: int = 4,
    filters: int = 128,
    output_filters: int = 256,
) -> tuple:
    """Hourglass stem (hourglass.py:44)."""
    return ("hg_stem", pool, pooling_stride, filters, output_filters)


def DownsamplingBlock(filters: int = 256) -> tuple:
    """Hourglass encoder block: pool(s2) -> conv3x3+BN (hourglass.py:100)."""
    return ("hg_down", True, 2, filters)


def SpaceToDepthBlock(factor: int = 2) -> tuple:
    """Lossless pixel-shuffle stem: (H, W, C) -> (H/f, W/f, C*f*f).

    TPU-native stem (no reference counterpart): folds early downsampling
    into a free reshape so the first convolutions run at reduced spatial
    size with f^2 x the input channels — dramatically better MXU lane
    utilization than stride-1 convs on 1-channel images, and information-
    preserving unlike resize-based input scaling.
    """
    return ("s2d", True, factor)


def SimpleUpsamplingBlock(
    upsampling_stride: int = 2,
    transposed_conv: bool = False,
    transposed_conv_filters: int = 64,
    transposed_conv_kernel_size: int = 3,
    transposed_conv_use_bias: bool = True,
    transposed_conv_batch_norm: bool = True,
    transposed_conv_activation: str = "relu",
    interp_method: str = "bilinear",
    skip_connection: bool = False,
    skip_add: bool = False,
    refine_convs: int = 2,
    refine_convs_first_filters: Optional[int] = None,
    refine_convs_filters: int = 64,
    refine_convs_kernel_size: int = 3,
    refine_convs_use_bias: bool = True,
    refine_convs_batch_norm: bool = True,
    refine_convs_activation: str = "relu",
) -> tuple:
    """(transposed conv | interp) -> [skip concat/add] -> refine convs."""
    return (
        "simple_up",
        upsampling_stride,
        transposed_conv,
        transposed_conv_filters,
        transposed_conv_kernel_size,
        transposed_conv_use_bias,
        transposed_conv_batch_norm,
        transposed_conv_activation,
        interp_method,
        skip_connection,
        skip_add,
        refine_convs,
        refine_convs_first_filters,
        refine_convs_filters,
        refine_convs_kernel_size,
        refine_convs_use_bias,
        refine_convs_batch_norm,
        refine_convs_activation,
    )


def HourglassUpsamplingBlock(filters: int = 256, interp_method: str = "nearest") -> tuple:
    """Hourglass decoder block (hourglass.py:137)."""
    return ("hg_up", 2, filters, interp_method)


def block_pool(blk: tuple) -> bool:
    """Whether this encoder block downsamples (and by what stride)."""
    kind = blk[0]
    if kind in ("simple_conv", "pooling", "hg_stem", "hg_down", "s2d"):
        return bool(blk[1])
    return False


def block_pooling_stride(blk: tuple) -> int:
    if blk[0] == "simple_conv":
        return int(blk[3])
    if blk[0] in ("pooling", "hg_stem", "hg_down", "s2d"):
        return int(blk[2])
    return 1


_S2D_VIA_CONV = False  # one-hot-conv alternative measured SLOWER; see below
# Batch-minor 6-D shuffle variant (see space_to_depth below); env-gated for
# in-context A/B on the TPU.
_S2D_VIA_BATCH_MINOR = os.environ.get("SLEAP_TPU_S2D_BATCH_MINOR", "0") == "1"


def space_to_depth(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/f, W/f, C*f*f); inverse of depth_to_space.

    The 6-D transpose lowers to two layout copies at ~5% HBM efficiency
    (~0.8 ms/batch-8 @1024², profiled), but the alternative — a
    stride-``factor`` convolution with a constant one-hot kernel — measured
    2 ms SLOWER in-context (bottom-up batch 8: 11.9 -> 14.0 ms/batch): the
    C_in=1 stride-4 conv gets no MXU tiling. Keeping the reshape.
    """
    n, h, w, c = x.shape
    if _S2D_VIA_CONV:
        import numpy as np

        k = np.zeros((factor, factor, c, c * factor * factor), np.float32)
        for dy in range(factor):
            for dx in range(factor):
                for ci in range(c):
                    k[dy, dx, ci, (dy * factor + dx) * c + ci] = 1.0
        return jax.lax.conv_general_dilated(
            x,
            jnp.asarray(k, x.dtype),
            (factor, factor),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if _S2D_VIA_BATCH_MINOR:
        # Perform the 6-D shuffle with the batch dim LOGICALLY LAST: on TPU
        # the surrounding ops prefer physical (H, W, C, N) anyway (the conv
        # emitters' favorite layout — see the peaks-kernel layout notes in
        # ops/pallas_peaks.py), so the leading transpose replaces an
        # XLA-inserted relayout, the f×f patch gather moves only OUTER dims
        # (contiguous (f, c, n) chunks), and the final transpose back to
        # logical NHWC folds to a bitcast at the consumer. Channel order
        # matches the reshape path: (dy * f + dx) * c + ci.
        t = jnp.transpose(x, (1, 2, 3, 0))  # (H, W, C, N)
        t = t.reshape(h // factor, factor, w // factor, factor, c, n)
        t = jnp.transpose(t, (0, 2, 1, 3, 4, 5))
        t = t.reshape(h // factor, w // factor, factor * factor * c, n)
        return jnp.transpose(t, (3, 0, 1, 2))
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // factor, w // factor, factor * factor * c)


def block_upsampling_stride(blk: tuple) -> int:
    return int(blk[1])


# --------------------------------------------------------------------------- #
# Folded space-to-depth stem
# --------------------------------------------------------------------------- #

#: Fused upsample+skip+conv (:class:`_FusedUpSplitConv`) applies when the
#: pre-upsample spatial size is in [FUSED_UP_MIN, FUSED_UP_MAX). Measured on
#: the v5e (bottom-up @1024², batch 256): small crop-model maps (<64²) lose
#: ~8% to the border-strip recompute, so the lower gate; the upper gate is a
#: tuning knob for per-level A/Bs (None = no upper bound).
FUSED_UP_MIN = 64
FUSED_UP_MAX = None

#: Interior-conv form for :func:`fused_up2_conv`: ``dil2d`` (6x6 kernel,
#: lhs_dilation=(2,2) — XLA's internal phase decomposition), ``phase``
#: (explicit subpixel conv, 3x3 kernel with 4x output channels + d2s
#: reshuffle), or ``hdil`` (H-dilated only, W phases in channels + free
#: reshape). All bit-identical up to float reassociation (tests). An
#: optional ``:<max_co>`` suffix applies the variant only to convs with at
#: most that many output channels (e.g. ``phase:64`` hits bottom-up's dec1
#: but leaves dec0 on dil2d). Resolved at import time — reading env vars
#: inside jitted code silently pins the first value seen into the trace
#: cache (see ops/pallas_peaks.py).
_FUSED_UP_VARIANT = os.environ.get("SLEAP_TPU_FUSED_UP_VARIANT", "dil2d")
if ":" in _FUSED_UP_VARIANT:
    _v, _c = _FUSED_UP_VARIANT.split(":", 1)
    _FUSED_UP_VARIANT, _FUSED_UP_VARIANT_MAX_CO = _v, int(_c)
else:
    _FUSED_UP_VARIANT_MAX_CO = None
if _FUSED_UP_VARIANT not in ("dil2d", "phase", "hdil"):
    raise ValueError(
        f"SLEAP_TPU_FUSED_UP_VARIANT={_FUSED_UP_VARIANT!r}: expected "
        "dil2d|phase|hdil with optional :<max_co> suffix"
    )

#: When True (and ``EncoderDecoderNet.fold_s2d_stem`` is unset), the s2d stem
#: map is never materialized: every 3x3 SAME conv that consumes it is applied
#: as an equivalent (3f)x(3f) stride-f conv on the raw image instead, so the
#: 6-D s2d transpose (two HBM layout copies) disappears from the graph.
FOLD_S2D_STEM = False


class _VirtualS2D:
    """A space-to-depth map represented lazily by its raw pre-s2d image.

    ``shape`` mimics the materialized map so channel bookkeeping (param
    shapes, concat offsets) is unchanged; consumers that know how fold their
    conv onto ``raw`` via :func:`conv_over_s2d`, anyone else calls
    :meth:`materialize`.
    """

    def __init__(self, raw: jnp.ndarray, factor: int):
        self.raw = raw
        self.factor = int(factor)

    @property
    def shape(self):
        n, h, w, c = self.raw.shape
        f = self.factor
        return (n, h // f, w // f, c * f * f)

    def materialize(self) -> jnp.ndarray:
        return space_to_depth(self.raw, self.factor)


def fold_s2d_kernel(kernel: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Rewrite a conv-over-s2d kernel as a conv-over-raw kernel.

    A (kh, kw, f*f*c, co) kernel applied to ``space_to_depth(x, f)`` computes
    the same map as the returned (kh*f, kw*f, c, co) kernel applied to ``x``
    with stride f: tap (ku, kv) on s2d channel (u_off*f + v_off)*c + ci reads
    raw pixel (ku*f + u_off, kv*f + v_off) of channel ci.
    """
    kh, kw, cin, co = kernel.shape
    f = int(factor)
    c_raw = cin // (f * f)
    k = kernel.reshape(kh, kw, f, f, c_raw, co)
    k = jnp.transpose(k, (0, 2, 1, 3, 4, 5))
    return k.reshape(kh * f, kw * f, c_raw, co)


def conv_over_s2d(virtual: "_VirtualS2D", kernel: jnp.ndarray) -> jnp.ndarray:
    """SAME conv over a (virtual) s2d map without materializing it.

    Exact (modulo float reassociation): SAME padding of ``kh // 2`` s2d
    pixels equals ``(kh // 2) * f`` raw zero pixels. Odd kernels only.
    """
    kh = int(kernel.shape[0])
    if kh % 2 != 1:
        raise ValueError("conv_over_s2d requires an odd kernel size.")
    f = virtual.factor
    pad = (kh // 2) * f
    return jax.lax.conv_general_dilated(
        virtual.raw.astype(kernel.dtype),
        fold_s2d_kernel(kernel, f),
        (f, f),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class _S2DFoldedConv(nn.Module):
    """SAME conv over an s2d map, applied folded on the raw image.

    Parameter tree (``kernel`` of shape (k, k, f*f*c, features), ``bias``)
    is identical to the ``nn.Conv`` it replaces, so checkpoints trained
    either way load interchangeably and the fold is a pure runtime flag.
    """

    features: int
    kernel_size: int
    use_bias: bool
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, virtual: _VirtualS2D):
        k = int(self.kernel_size)
        c_in = int(virtual.shape[-1])
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, c_in, int(self.features)),
        )
        y = conv_over_s2d(virtual, kernel.astype(self.compute_dtype))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (int(self.features),)
            )
            y = y + bias.astype(self.compute_dtype)
        return y


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "linear": lambda x: x,
    "sigmoid": jax.nn.sigmoid,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
}


def apply_activation(x: jnp.ndarray, name: str) -> jnp.ndarray:
    return _ACTIVATIONS[name](x)


def max_pool_same(x: jnp.ndarray, stride: int, pool_size: int = 2) -> jnp.ndarray:
    """MaxPool2D(pool_size=2, padding='same')."""
    return nn.max_pool(
        x, window_shape=(pool_size, pool_size), strides=(stride, stride), padding="SAME"
    )


def upsample(x: jnp.ndarray, stride: int, method: str) -> jnp.ndarray:
    """UpSampling2D equivalent (half-pixel-center resize, matching TF2)."""
    n, h, w, c = x.shape
    if method == "nearest":
        return jnp.repeat(jnp.repeat(x, stride, axis=1), stride, axis=2)
    return jax.image.resize(x, (n, h * stride, w * stride, c), method="bilinear")


# --------------------------------------------------------------------------- #
# Executor module
# --------------------------------------------------------------------------- #


# Phase-coefficient table for 2x bilinear upsampling (half-pixel centers,
# edge clamp — jax.image.resize / TF UpSampling2D semantics):
#   up[2i]   = 0.25 x[i-1] + 0.75 x[i]
#   up[2i+1] = 0.75 x[i]   + 0.25 x[i+1]
# _UP2_A[p, u, d] = coefficient of x[i+d-1] in up[2i + p + u - 1], i.e. the
# weight that input tap d (of a 3-tap window) contributes to the conv tap u
# of output phase p. Used to fold the upsample into a following 3x3 conv.
_UP2_A = np.zeros((2, 3, 3), np.float32)
_UP2_A[0, 0, 0] = 0.75  # up[2i-1] = .75 x[i-1] + .25 x[i]
_UP2_A[0, 0, 1] = 0.25
_UP2_A[0, 1, 0] = 0.25  # up[2i]   = .25 x[i-1] + .75 x[i]
_UP2_A[0, 1, 1] = 0.75
_UP2_A[0, 2, 1] = 0.75  # up[2i+1] = .75 x[i]   + .25 x[i+1]
_UP2_A[0, 2, 2] = 0.25
_UP2_A[1, 0, 0] = 0.25  # up[2i]
_UP2_A[1, 0, 1] = 0.75
_UP2_A[1, 1, 1] = 0.75  # up[2i+1]
_UP2_A[1, 1, 2] = 0.25
_UP2_A[1, 2, 1] = 0.25  # up[2i+2] = .25 x[i] + .75 x[i+1]
_UP2_A[1, 2, 2] = 0.75


def _up2_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x bilinear upsample (half-pixel, clamp) along one axis."""
    n = x.shape[axis]
    prev = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis)
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, n, axis=axis),
         jax.lax.slice_in_dim(x, n - 1, n, axis=axis)], axis=axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    y = jnp.stack([even, odd], axis=axis + 1)
    shp = list(x.shape)
    shp[axis] = 2 * n
    return y.reshape(shp)


def fused_up2_conv(
    x: jnp.ndarray, kernel: jnp.ndarray, variant: Optional[str] = None
) -> jnp.ndarray:
    """``conv_SAME(bilinear_up2(x), kernel)`` without materializing the
    upsampled array.

    Interior outputs come from a subpixel (phase) conv at the LOW
    resolution: each 2x2 output phase is a 3x3 conv of x with a kernel
    derived from ``kernel`` and the bilinear tap table (``_UP2_A``), giving a
    conv with 4x the output channels — far better MXU utilization than the
    stock resize (dot_general) + conv chain, which also materializes the 4x
    larger activation through layout copies (~5 ms of a 29 ms batch-32
    bottom-up forward @1024², profiled).

    The one-pixel output border is recomputed exactly: there the SAME conv
    reads ZERO padding of the upsampled array, while the phase conv's
    edge-padded x reproduces the upsample's CLAMP — so border rows/columns
    are re-derived from small upsampled strips with explicit zero padding.

    Args:
        x: (B, N, M, C_in).
        kernel: (3, 3, C_in, C_out) HWIO.

    Returns:
        (B, 2N, 2M, C_out), bitwise semantics of the unfused composition
        (up to float reassociation).
    """
    B, N, M, C = x.shape
    co = kernel.shape[-1]
    # Input-dilated (transposed-conv) form: compose the 2x bilinear up kernel
    # g = [0.25, 0.75, 0.75, 0.25] (the 2-phase hat taps laid out on the
    # zero-dilated grid) with the 3x3 conv into ONE 6x6 kernel applied with
    # lhs_dilation=2. XLA's TPU lowering of input-dilated convs does the
    # phase decomposition internally WITHOUT materializing the
    # depth-to-space relayout — measured 3.5 ms vs 11.3 ms for the explicit
    # phase-conv + 6-D-transpose d2s at (64, 128, 128, 128)->256^2x64 (the
    # d2s's two layout copies were ~14.5 ms/iter of the batch-256 bottom-up
    # trace). Interior derivation: edge-pad x by 1 so the dilated sequence
    # reproduces the upsample's CLAMP at the first/last sample; then
    # y[j] = sum_m K6[m] d[j + m - 1] with K6[m] = sum_{u+s=m} g[s] W[u].
    G = np.zeros((6, 3), np.float32)
    for u in range(3):
        G[u : u + 4, u] = [0.25, 0.75, 0.75, 0.25]
    Gj = jnp.asarray(G, kernel.dtype)
    K6 = jnp.einsum("mu,nv,uvio->mnio", Gj, Gj, kernel)

    if variant is None:
        variant = _FUSED_UP_VARIANT
        if _FUSED_UP_VARIANT_MAX_CO is not None and co > _FUSED_UP_VARIANT_MAX_CO:
            variant = "dil2d"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    if variant == "phase":
        # Explicit subpixel form: one 3x3 conv emitting all 4 output phases
        # as channels, then a depth-to-space reshuffle. Same FLOPs as dil2d
        # (each phase uses a stride-2 3x3 subset of K6), but the 4x channel
        # count keeps the MXU lanes full: at dec1's (256,128,128,128)->64
        # shape this runs 14.2 vs 18.3 ms isolated (88% vs 68% of the FLOP
        # floor; scripts/ab_dec1.py), and the d2s cost vanishes into the
        # conv epilogue (phase-only == phase+d2s to 0.01 ms).
        kp = jnp.concatenate(
            [
                K6[(1 - p)::2][:3][:, (1 - q)::2][:, :3]
                for p in range(2)
                for q in range(2)
            ],
            axis=-1,
        )  # (3, 3, cin, 4co); taps m = 2a + 1 - p  ==  K6[(1 - p)::2]
        yp = jax.lax.conv_general_dilated(
            xp, kp, (1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, N, M, 4co), channel blocks ordered (p, q, co)
        yp = yp.reshape(B, N, M, 2, 2, co)
        yp = jnp.transpose(yp, (0, 1, 3, 2, 4, 5))
        y = yp.reshape(B, 2 * N, 2 * M, co)
    elif variant == "hdil":
        # H-dilated-only form with the W phases carried in channels: the
        # (6, 3, cin, 2co) kernel keeps H on the input-dilated grid (XLA's
        # internal phase decomposition, as below) but decomposes W's two
        # phases into output channels, so the conv emits 2co channels and the
        # (..., M, 2, co) -> (..., 2M, co) merge is a FREE reshape (adjacent
        # dims, channel-minor layout — a bitcast, not the 6-D d2s transpose).
        # Same FLOPs; for co < 128 the doubled channel count fills the MXU
        # lanes, flipping XLA from the batch-in-lanes matmul emitter (60% of
        # the FLOP floor at dec1's (256,128,128,128)->64 shape) to
        # batch-in-sublanes (91% at dec0's same-FLOP shape). A/B:
        # scripts/ab_dec1.py.
        kw = jnp.concatenate(
            [K6[:, 1 - q :: 2][:, :3] for q in range(2)], axis=-1
        )  # (6, 3, cin, 2co); W taps n = 2a + 1 - q select phase q
        y = jax.lax.conv_general_dilated(
            xp, kw, (1, 1), padding=((1, 1), (0, 0)), lhs_dilation=(2, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, 2N, M, 2co)
        y = y.reshape(y.shape[0], y.shape[1], 2 * M, co)
    else:
        y = jax.lax.conv_general_dilated(
            xp, K6, (1, 1), padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, 2N, 2M, co); 1-px border fixed below (zero-pad SAME semantics)

    # ---- Exact border recomputation (zero-padded SAME conv semantics). ----
    def conv_strip(strip):
        return jax.lax.conv_general_dilated(
            strip, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def zpad_w(strip):  # zero columns left/right (the conv's own padding)
        return jnp.pad(strip, ((0, 0), (0, 0), (1, 1), (0, 0)))

    # Top/bottom rows: conv over [zero row; up rows 0..1] etc.
    top_u = _up2_axis(x[:, :2], 1)[:, :2]          # up rows 0..1
    top_u = _up2_axis(top_u, 2)                    # full-width strip
    top_strip = jnp.pad(zpad_w(top_u), ((0, 0), (1, 0), (0, 0), (0, 0)))
    bot_u = _up2_axis(x[:, -2:], 1)[:, -2:]        # up rows 2N-2..2N-1
    bot_u = _up2_axis(bot_u, 2)
    bot_strip = jnp.pad(zpad_w(bot_u), ((0, 0), (0, 1), (0, 0), (0, 0)))
    y = y.at[:, :1].set(conv_strip(top_strip))
    y = y.at[:, -1:].set(conv_strip(bot_strip))

    # Left/right columns: conv over [zero col; up cols 0..1] etc., with zero
    # rows top/bottom so the corners also match the SAME conv exactly.
    def zpad_h(strip):
        return jnp.pad(strip, ((0, 0), (1, 1), (0, 0), (0, 0)))

    left_u = _up2_axis(_up2_axis(x[:, :, :2], 2)[:, :, :2], 1)
    left_strip = jnp.pad(zpad_h(left_u), ((0, 0), (0, 0), (1, 0), (0, 0)))
    right_u = _up2_axis(_up2_axis(x[:, :, -2:], 2)[:, :, -2:], 1)
    right_strip = jnp.pad(zpad_h(right_u), ((0, 0), (0, 0), (0, 1), (0, 0)))
    y = y.at[:, :, :1].set(conv_strip(left_strip))
    y = y.at[:, :, -1:].set(conv_strip(right_strip))
    return y


class _FusedUpSplitConv(nn.Module):
    """First decoder refine conv with the 2x bilinear upsample folded in.

    Computes ``conv(concat([skip, up2(x)]), W) + b`` as
    ``conv(skip, W_skip) + fused_up2_conv(x, W_up) + b`` — exact (same
    params, same math up to float reassociation), but the up-part conv runs
    at LOW resolution with 4x output channels (phase/subpixel form), so the
    4x-larger upsampled activation is never materialized. See
    :func:`fused_up2_conv` for the border-exactness construction. Parameter
    tree matches the ``nn.Conv`` it replaces.
    """

    features: int
    kernel_size: int
    use_bias: bool
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, skip, x_lowres):
        k = int(self.kernel_size)
        c_skip = int(skip.shape[-1])
        c_up = int(x_lowres.shape[-1])
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, c_skip + c_up, int(self.features)),
        )
        kernel = kernel.astype(self.compute_dtype)
        y = fused_up2_conv(
            x_lowres.astype(self.compute_dtype),
            jax.lax.slice_in_dim(kernel, c_skip, c_skip + c_up, axis=2),
        )
        skip_kernel = jax.lax.slice_in_dim(kernel, 0, c_skip, axis=2)
        if isinstance(skip, _VirtualS2D):
            y = y + conv_over_s2d(skip, skip_kernel)
        else:
            y = y + jax.lax.conv_general_dilated(
                skip.astype(self.compute_dtype),
                skip_kernel,
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (int(self.features),)
            )
            y = y + bias.astype(self.compute_dtype)
        return y


class _SplitConv(nn.Module):
    """Conv over a virtual channel-concat, applied as per-part convs summed.

    ``conv(concat(parts), W) == sum_i conv(parts[i], W[:, :, off_i:off_i+c_i])``
    exactly, but skipping the concat lets XLA keep each part in its producer's
    layout: on TPU the skip-concat in the UNet decoder otherwise materializes
    a relayout copy of the full-resolution activation (profiled at ~4 ms of a
    33 ms batch-32 bottom-up forward @1024²). Parameter tree (``kernel``,
    ``bias`` under this module's name) is identical to the ``nn.Conv`` it
    replaces, so checkpoints are interchangeable.
    """

    features: int
    kernel_size: int
    use_bias: bool
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts):
        k = int(self.kernel_size)
        c_in = sum(int(p.shape[-1]) for p in parts)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, c_in, int(self.features)),
        )
        kernel = kernel.astype(self.compute_dtype)
        out = None
        off = 0
        for p in parts:
            c = int(p.shape[-1])
            part_kernel = jax.lax.slice_in_dim(kernel, off, off + c, axis=2)
            if isinstance(p, _VirtualS2D):
                y = conv_over_s2d(p, part_kernel)
            else:
                y = jax.lax.conv_general_dilated(
                    p.astype(self.compute_dtype),
                    part_kernel,
                    window_strides=(1, 1),
                    padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            out = y if out is None else out + y
            off += c
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (int(self.features),)
            )
            out = out + bias.astype(self.compute_dtype)
        return out


class EncoderDecoderNet(nn.Module):
    """Executes (stem, encoder, decoder) block-descriptor stacks.

    Returns from ``__call__``: ``(outputs, intermediates)`` where outputs is a
    list of per-stack final tensors and intermediates a list (per stack) of
    stride-tagged decoder features (reference encoder_decoder.py:403
    ``make_backbone`` contract).
    """

    stem_blocks: tuple = ()
    encoder_blocks: tuple = ()
    decoder_blocks: tuple = ()
    stacks: int = 1
    compute_dtype: Any = jnp.float32
    fold_s2d_stem: Optional[bool] = None  # None -> module default FOLD_S2D_STEM

    def _normalize_int(self, x):
        # Divide by the dtype max (tf.image.convert_image_dtype semantics,
        # matching data.normalization.ensure_float): uint8 /255, uint16
        # /65535 — NOT a hardcoded /255 for every integer width.
        scale = float(jnp.iinfo(x.dtype).max)
        return (x.astype(jnp.float32) / scale).astype(self.compute_dtype)

    @nn.compact
    def __call__(self, x, train: bool = False):
        current_stride = 1
        fold_s2d = (
            FOLD_S2D_STEM if self.fold_s2d_stem is None else self.fold_s2d_stem
        )
        # Integer inputs are raw pixels: normalize to [0, 1] like
        # ``ensure_float`` (reference normalization.py ensure_float). When the
        # net starts with a space-to-depth stem, defer the normalize until
        # after the stem so the big transpose moves 1-byte elements instead of
        # bf16/f32 — s2d is pure data movement, so the result is bit-identical
        # ((f32(x)/255) -> compute_dtype either side of the shuffle).
        if jnp.issubdtype(x.dtype, jnp.integer):
            first_blocks = tuple(self.stem_blocks) + tuple(self.encoder_blocks)
            s2d_first = (
                not fold_s2d and first_blocks and first_blocks[0][0] == "s2d"
            )
            if not s2d_first:
                x = self._normalize_int(x)
        else:
            x = x.astype(self.compute_dtype)

        def conv(x, filters, kernel_size, use_bias, name):
            return nn.Conv(
                features=int(filters),
                kernel_size=(kernel_size, kernel_size),
                padding="SAME",
                use_bias=use_bias,
                dtype=self.compute_dtype,
                name=name,
            )(x)

        def bn(x, name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.compute_dtype,
                name=name,
            )(x)

        def run_encoder_block(x, blk, prefix: str):
            kind = blk[0]
            if kind == "simple_conv":
                (_, pool, pool_before, pstride, num_convs, filters, ksize,
                 use_bias, batch_norm, activation) = blk
                if isinstance(x, _VirtualS2D) and (
                    (pool and pool_before) or ksize % 2 != 1 or num_convs < 1
                ):
                    x = x.materialize()
                if pool and pool_before:
                    x = max_pool_same(x, pstride)
                for i in range(num_convs):
                    if i == 0 and isinstance(x, _VirtualS2D):
                        x = _S2DFoldedConv(
                            features=int(filters),
                            kernel_size=ksize,
                            use_bias=use_bias,
                            compute_dtype=self.compute_dtype,
                            name=f"{prefix}_conv{i}",
                        )(x)
                    else:
                        x = conv(x, filters, ksize, use_bias, f"{prefix}_conv{i}")
                    if batch_norm:
                        x = bn(x, f"{prefix}_bn{i}")
                    x = apply_activation(x, activation)
                if pool and not pool_before:
                    x = max_pool_same(x, pstride)
                return x
            if isinstance(x, _VirtualS2D):
                x = x.materialize()
            if kind == "pooling":
                _, pool, pstride = blk
                return max_pool_same(x, pstride) if pool else x
            if kind == "s2d":
                _, _, factor = blk
                if fold_s2d and factor > 1:
                    return _VirtualS2D(x, factor)
                x = space_to_depth(x, factor)
                if jnp.issubdtype(x.dtype, jnp.integer):
                    x = self._normalize_int(x)  # deferred from __call__
                return x
            if kind == "hg_stem":
                _, pool, pstride, filters, output_filters = blk
                s1 = 2 if (pool and pstride == 4) else 1
                x = nn.Conv(
                    filters, (7, 7), strides=(s1, s1), padding="SAME",
                    dtype=self.compute_dtype, name=f"{prefix}_conv7x7",
                )(x)
                x = apply_activation(x, "relu")
                x = bn(x, f"{prefix}_conv7x7_bn")
                x = conv(x, 2 * filters, 3, True, f"{prefix}_conv3x3")
                x = apply_activation(x, "relu")
                x = bn(x, f"{prefix}_conv3x3_bn")
                x = max_pool_same(x, 2 if (pool and pstride > 1) else 1)
                x = conv(x, output_filters, 3, True, f"{prefix}_conv3x3_out")
                x = apply_activation(x, "relu")
                x = bn(x, f"{prefix}_conv3x3_out_bn")
                return x
            if kind == "hg_down":
                _, _, _, filters = blk
                x = max_pool_same(x, 2)
                x = conv(x, filters, 3, True, f"{prefix}_conv")
                x = apply_activation(x, "relu")
                x = bn(x, f"{prefix}_bn")
                return x
            raise TypeError(f"Unknown encoder block kind {kind!r}")

        def run_decoder_block(x, blk, skip, prefix: str):
            kind = blk[0]
            if kind == "simple_up":
                (_, up_stride, t_conv, t_filters, t_ksize, t_bias, t_bn, t_act,
                 interp, skip_conn, skip_add, n_refine, r_first, r_filters,
                 r_ksize, r_bias, r_bn, r_act) = blk
                # A virtual s2d skip can only be consumed folded (by the
                # split-conv paths below); materialize it for any other path.
                if isinstance(skip, _VirtualS2D) and not (
                    skip_conn and not skip_add and n_refine > 0
                    and r_ksize % 2 == 1
                ):
                    skip = skip.materialize()
                # Fused path: bilinear 2x upsample + skip-concat + first
                # refine conv collapse into one low-res subpixel conv. Only
                # worth it on large maps: measured on TPU, >=64^2 pre-upsample
                # wins (bottom-up @1024^2: +13%), while small crop-model maps
                # (20-40^2) lose to the border-strip recompute overhead
                # (top-down @160^2 crops: -8%).
                if (
                    not t_conv
                    and interp == "bilinear"
                    and up_stride == 2
                    and skip_conn
                    and skip is not None
                    and not skip_add
                    and n_refine > 0
                    and r_ksize == 3  # fused_up2_conv composes 3-tap kernels
                    and min(x.shape[1], x.shape[2]) >= FUSED_UP_MIN
                    and (
                        FUSED_UP_MAX is None
                        or min(x.shape[1], x.shape[2]) < FUSED_UP_MAX
                    )
                ):
                    filters0 = r_first if r_first is not None else r_filters
                    x = _FusedUpSplitConv(
                        features=int(filters0),
                        kernel_size=r_ksize,
                        use_bias=r_bias,
                        compute_dtype=self.compute_dtype,
                        name=f"{prefix}_refine_conv0",
                    )(skip, x)
                    if r_bn:
                        x = bn(x, f"{prefix}_refine_conv0_bn")
                    x = apply_activation(x, r_act)
                    for i in range(1, n_refine):
                        x = conv(x, r_filters, r_ksize, r_bias, f"{prefix}_refine_conv{i}")
                        if r_bn:
                            x = bn(x, f"{prefix}_refine_conv{i}_bn")
                        x = apply_activation(x, r_act)
                    return x
                if t_conv:
                    x = nn.ConvTranspose(
                        features=int(t_filters),
                        kernel_size=(t_ksize, t_ksize),
                        strides=(up_stride, up_stride),
                        padding="SAME",
                        use_bias=t_bias,
                        dtype=self.compute_dtype,
                        name=f"{prefix}_trans_conv",
                    )(x)
                    if t_bn:
                        x = bn(x, f"{prefix}_trans_conv_bn")
                    x = apply_activation(x, t_act)
                else:
                    x = upsample(x, up_stride, interp)
                concat_parts = None
                if skip_conn and skip is not None:
                    if skip_add:
                        src = skip
                        if src.shape[-1] != x.shape[-1]:
                            src = conv(src, x.shape[-1], 1, True, f"{prefix}_skip_conv1x1")
                        x = src + x
                    elif n_refine > 0:
                        # Feed the first refine conv the parts unconcatenated
                        # (_SplitConv): same math + params, no relayout copy.
                        concat_parts = [skip, x]
                    else:
                        x = jnp.concatenate([skip, x], axis=-1)
                for i in range(n_refine):
                    filters = r_filters
                    if i == 0 and r_first is not None:
                        filters = r_first
                    if i == 0 and concat_parts is not None:
                        x = _SplitConv(
                            features=int(filters),
                            kernel_size=r_ksize,
                            use_bias=r_bias,
                            compute_dtype=self.compute_dtype,
                            name=f"{prefix}_refine_conv{i}",
                        )(concat_parts)
                    else:
                        x = conv(x, filters, r_ksize, r_bias, f"{prefix}_refine_conv{i}")
                    if r_bn:
                        x = bn(x, f"{prefix}_refine_conv{i}_bn")
                    x = apply_activation(x, r_act)
                return x
            if kind == "hg_up":
                _, up_stride, filters, interp = blk
                if isinstance(skip, _VirtualS2D):
                    skip = skip.materialize()
                xm = conv(x, filters, 3, True, f"{prefix}_conv")
                xm = apply_activation(xm, "relu")
                xm = bn(xm, f"{prefix}_conv_bn")
                xm = upsample(xm, up_stride, interp)
                xs = conv(skip, filters, 3, True, f"{prefix}_skip")
                xs = apply_activation(xs, "relu")
                xs = bn(xs, f"{prefix}_skip_bn")
                return xm + xs
            raise TypeError(f"Unknown decoder block kind {kind!r}")

        # ---- Stem ----
        stem_features: List[IntermediateFeature] = []
        for i, blk in enumerate(self.stem_blocks):
            x = run_encoder_block(x, blk, f"stem{i}")
            if block_pool(blk):
                current_stride *= block_pooling_stride(blk)
        if self.stem_blocks:
            stem_features = [IntermediateFeature(x, current_stride)]

        if self.stacks > 1:
            # Stacked nets chain each stack's decoder output into the next
            # stack's encoder, so the decoder must return to the stem output
            # stride (reference encoder_decoder.py:632-638 raises the same).
            enc_prod = 1
            for blk in self.encoder_blocks:
                if block_pool(blk):
                    enc_prod *= block_pooling_stride(blk)
            dec_prod = 1
            for blk in self.decoder_blocks:
                dec_prod *= block_upsampling_stride(blk)
            if enc_prod != dec_prod:
                raise ValueError(
                    "If using a stacked configuration, the backbone must define "
                    "symmetric encoder and decoder. Create a stem for initial "
                    "downsampling if an output stride > 1 is desired."
                )

        outputs = []
        intermediates = []
        for s in range(self.stacks):
            # ---- Encoder ----
            enc_features: List[IntermediateFeature] = []
            enc_stride = current_stride
            for i, blk in enumerate(self.encoder_blocks):
                x = run_encoder_block(x, blk, f"stack{s}_enc{i}")
                if block_pool(blk):
                    enc_stride *= block_pooling_stride(blk)
                if enc_stride not in [f.stride for f in enc_features]:
                    enc_features.append(IntermediateFeature(x, enc_stride))
            enc_features = enc_features[:-1]

            # ---- Decoder ----
            skip_sources = stem_features + enc_features
            dec_features: List[IntermediateFeature] = []
            dec_stride = enc_stride
            for i, blk in enumerate(self.decoder_blocks):
                dec_features.append(IntermediateFeature(x, dec_stride))
                next_stride = dec_stride // block_upsampling_stride(blk)
                skip = None
                for f in skip_sources:
                    if f.stride == next_stride:
                        skip = f.tensor
                        break
                x = run_decoder_block(x, blk, skip, f"stack{s}_dec{i}")
                dec_stride = next_stride

            outputs.append(x)
            intermediates.append(dec_features)

        return outputs, intermediates
