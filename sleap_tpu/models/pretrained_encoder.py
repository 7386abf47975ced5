"""UNet decoder over standard classification encoders (flax).

Rebuild of ``/root/reference/sleap/nn/architectures/pretrained_encoders.py``
(``UnetPretrainedEncoder:98``), which wraps the ``segmentation_models`` Keras
zoo. TPU-native re-design:

- The reference zoo's encoder families are implemented natively in flax
  (``efficientnetb0-b7``, ``resnet18/34/50/101/152``, ``resnext50/101``,
  ``seresnet18-152``, ``seresnext50/101``, ``mobilenet``/``mobilenetv2``,
  ``densenet121/169/201``, ``vgg16/19``) — standard architectures, max
  stride 32, skip features collected right before each spatial reduction
  (the same contract as the zoo's ``Unet`` feature layers). The three names
  with no flax rebuild (``inceptionv3``, ``inceptionresnetv2``,
  ``senet154``) raise with a nearest-supported-family migration hint
  (see ``UNSUPPORTED_ENCODER_HINTS``).
- The decoder mirrors ``sm.models.unet`` with ``decoder_block_type=
  "upsampling"``: nearest-up x2 -> concat skip -> (conv3x3 + BN + ReLU) x2
  per block (layers ``decoder_stage{i}{a,b}``), 4 blocks by default
  (output stride 2).
- ImageNet *weights* cannot be downloaded in this offline environment
  (reference pretrained_encoders.py:219 would fetch them). The architecture
  is fully supported with random init; ``pretrained=True`` additionally
  looks for a local ``.npz`` of converted weights under
  ``$SLEAP_TPU_PRETRAINED_DIR/<encoder>.npz`` (see
  :func:`load_local_encoder_weights`) and falls back to random init with a
  warning — only the download is gated, not the graph.
- Grayscale inputs are tiled to 3 channels (reference :206-211).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Tuple

import attr
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sleap_tpu.config import PretrainedEncoderConfig
from sleap_tpu.models.common import IntermediateFeature
from sleap_tpu.models.encoder_decoder import apply_activation, max_pool_same, upsample

logger = logging.getLogger(__name__)

# (expand_ratio, filters_out, repeats, stride, kernel) per EfficientNet stage.
_EFFNET_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)
# (width_mult, depth_mult) per EfficientNet variant (Tan & Le 2019, Table 1's
# compound-scaling coefficients — the same table torchvision/keras use).
_EFFNET_SCALING = {
    "efficientnetb0": (1.0, 1.0),
    "efficientnetb1": (1.0, 1.1),
    "efficientnetb2": (1.1, 1.2),
    "efficientnetb3": (1.2, 1.4),
    "efficientnetb4": (1.4, 1.8),
    "efficientnetb5": (1.6, 2.2),
    "efficientnetb6": (1.8, 2.6),
    "efficientnetb7": (2.0, 3.1),
}

# (expansion, channels, repeats, stride) per MobileNetV2 stage.
_MBV2_STAGES = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

# MobileNet v1 depthwise-separable stack: (pointwise filters, stride).
_MBV1_STAGES = (
    (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2), (1024, 1),
)

# ResNet-family specs: (block_counts, bottleneck, groups, base_width, se).
# groups/base_width follow the torchvision ResNeXt convention
# (width = int(f * base_width / 64) * groups); se adds the squeeze-excite
# module (ratio 16) of the SE-ResNet/SE-ResNeXt family.
_RESNET_SPECS = {
    "resnet18": ((2, 2, 2, 2), False, 1, 64, False),
    "resnet34": ((3, 4, 6, 3), False, 1, 64, False),
    "resnet50": ((3, 4, 6, 3), True, 1, 64, False),
    "resnet101": ((3, 4, 23, 3), True, 1, 64, False),
    "resnet152": ((3, 8, 36, 3), True, 1, 64, False),
    "resnext50": ((3, 4, 6, 3), True, 32, 4, False),
    "resnext101": ((3, 4, 23, 3), True, 32, 8, False),
    "seresnet18": ((2, 2, 2, 2), False, 1, 64, True),
    "seresnet34": ((3, 4, 6, 3), False, 1, 64, True),
    "seresnet50": ((3, 4, 6, 3), True, 1, 64, True),
    "seresnet101": ((3, 4, 23, 3), True, 1, 64, True),
    "seresnet152": ((3, 8, 36, 3), True, 1, 64, True),
    "seresnext50": ((3, 4, 6, 3), True, 32, 4, True),
    "seresnext101": ((3, 4, 23, 3), True, 32, 4, True),
}

# VGG conv repeats per 5 stages.
_VGG_REPS = {"vgg16": (2, 2, 3, 3, 3), "vgg19": (2, 2, 4, 4, 4)}

# DenseNet dense-block layer counts.
_DENSENET_BLOCKS = {
    "densenet121": (6, 12, 24, 16),
    "densenet169": (6, 12, 32, 32),
    "densenet201": (6, 12, 48, 32),
}

AVAILABLE_ENCODERS = sorted(
    set(_RESNET_SPECS)
    | set(_VGG_REPS)
    | set(_DENSENET_BLOCKS)
    | set(_EFFNET_SCALING)
    | {"mobilenet", "mobilenetv2"}
)

# Reference zoo names (config/model.py:597-620) that have no native flax
# rebuild here: loud error with a migration hint (the reference loads these
# from the segmentation_models Keras zoo, which needs downloads anyway).
UNSUPPORTED_ENCODER_HINTS = {
    "inceptionv3": "resnet50",
    "inceptionresnetv2": "resnet50",
    "senet154": "seresnet152",
}


def _round_filters(filters: float, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def _round_repeats(repeats: int, depth_mult: float) -> int:
    return int(np.ceil(repeats * depth_mult))


class UnetPretrainedEncoderModule(nn.Module):
    """Encoder (max stride 32) + sm-Unet-style upsampling decoder.

    Returns ``(outputs, intermediates)`` with the
    :class:`~sleap_tpu.models.encoder_decoder.EncoderDecoderNet` contract.
    """

    encoder: str = "efficientnetb0"
    decoder_filters: tuple = (256, 256, 128, 128)
    decoder_batchnorm: bool = True
    compute_dtype: Any = jnp.float32

    # ------------------------------------------------------------------ #
    # Shared layer helpers
    # ------------------------------------------------------------------ #
    def _bn(self, x, name, train):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.compute_dtype, name=name,
        )(x)

    def _conv(self, x, f, k, s, name, use_bias=False, groups=1):
        return nn.Conv(
            int(f), (k, k), strides=(s, s), padding="SAME", use_bias=use_bias,
            feature_group_count=groups, dtype=self.compute_dtype, name=name,
        )(x)

    # ------------------------------------------------------------------ #
    # Encoders. Each returns (x_stride32, {stride: skip_tensor}).
    # ------------------------------------------------------------------ #
    def _vgg(self, x, train):
        skips = {}
        stride = 1
        for si, (f, reps) in enumerate(
            zip((64, 128, 256, 512, 512), _VGG_REPS[self.encoder])
        ):
            for ri in range(reps):
                x = self._conv(x, f, 3, 1, f"block{si + 1}_conv{ri + 1}", use_bias=True)
                x = apply_activation(x, "relu")
            skips[stride] = x
            x = max_pool_same(x, 2)
            stride *= 2
        return x, skips

    def _se(self, x, name, ratio=16):
        """Squeeze-excite (SE-ResNet form: ReLU reduce, sigmoid gate)."""
        c = int(x.shape[-1])
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(max(1, c // ratio), (1, 1), dtype=self.compute_dtype,
                    name=f"{name}_se_reduce")(s)
        s = apply_activation(s, "relu")
        s = nn.Conv(c, (1, 1), dtype=self.compute_dtype,
                    name=f"{name}_se_expand")(s)
        return x * jax.nn.sigmoid(s)

    def _resnet(self, x, train):
        blocks, bottleneck, groups, base_width, se = _RESNET_SPECS[self.encoder]
        skips = {}
        x = self._conv(x, 64, 7, 2, "stem_conv")
        x = self._bn(x, "stem_bn", train)
        x = apply_activation(x, "relu")
        skips[2] = x
        x = max_pool_same(x, 2, pool_size=3)

        def basic_block(x, f, s, name):
            shortcut = x
            out = self._conv(x, f, 3, s, f"{name}_conv1")
            out = self._bn(out, f"{name}_bn1", train)
            out = apply_activation(out, "relu")
            out = self._conv(out, f, 3, 1, f"{name}_conv2")
            out = self._bn(out, f"{name}_bn2", train)
            if se:
                out = self._se(out, name)
            if s != 1 or shortcut.shape[-1] != f:
                shortcut = self._conv(x, f, 1, s, f"{name}_proj")
                shortcut = self._bn(shortcut, f"{name}_proj_bn", train)
            return apply_activation(out + shortcut, "relu")

        def bottleneck_block(x, f, s, name):
            # ResNeXt convention (torchvision): inner width scales with
            # base_width and groups; plain ResNet is groups=1, base_width=64.
            width = int(f * base_width / 64) * groups
            shortcut = x
            out = self._conv(x, width, 1, s, f"{name}_conv1")
            out = self._bn(out, f"{name}_bn1", train)
            out = apply_activation(out, "relu")
            out = self._conv(out, width, 3, 1, f"{name}_conv2", groups=groups)
            out = self._bn(out, f"{name}_bn2", train)
            out = apply_activation(out, "relu")
            out = self._conv(out, f * 4, 1, 1, f"{name}_conv3")
            out = self._bn(out, f"{name}_bn3", train)
            if se:
                out = self._se(out, name)
            if s != 1 or shortcut.shape[-1] != f * 4:
                shortcut = self._conv(x, f * 4, 1, s, f"{name}_proj")
                shortcut = self._bn(shortcut, f"{name}_proj_bn", train)
            return apply_activation(out + shortcut, "relu")

        block = bottleneck_block if bottleneck else basic_block
        stride = 4
        for si, (f, nb) in enumerate(zip((64, 128, 256, 512), blocks)):
            s1 = 1 if si == 0 else 2
            if s1 == 2:
                skips[stride] = x
                stride *= 2
            for bi in range(nb):
                x = block(x, f, s1 if bi == 0 else 1, f"stage{si + 1}_block{bi + 1}")
        return x, skips

    def _mobilenetv1(self, x, train):
        skips = {}
        x = self._conv(x, 32, 3, 2, "stem_conv")
        x = self._bn(x, "stem_bn", train)
        x = jax.nn.relu6(x)
        stride = 2
        for i, (f, s) in enumerate(_MBV1_STAGES):
            if s == 2:
                skips[stride] = x
                stride *= 2
            name = f"dw{i + 1}"
            x = self._conv(x, x.shape[-1], 3, s, f"{name}_dw", groups=x.shape[-1])
            x = self._bn(x, f"{name}_dw_bn", train)
            x = jax.nn.relu6(x)
            x = self._conv(x, f, 1, 1, f"{name}_pw")
            x = self._bn(x, f"{name}_pw_bn", train)
            x = jax.nn.relu6(x)
        return x, skips

    def _mobilenetv2(self, x, train):
        skips = {}

        def inverted_residual(x, t, c, s, name):
            f_in = x.shape[-1]
            out = x
            if t != 1:
                out = self._conv(out, f_in * t, 1, 1, f"{name}_expand")
                out = self._bn(out, f"{name}_expand_bn", train)
                out = jax.nn.relu6(out)
            out = self._conv(out, out.shape[-1], 3, s, f"{name}_dw", groups=out.shape[-1])
            out = self._bn(out, f"{name}_dw_bn", train)
            out = jax.nn.relu6(out)
            out = self._conv(out, c, 1, 1, f"{name}_project")
            out = self._bn(out, f"{name}_project_bn", train)
            if s == 1 and f_in == c:
                out = out + x
            return out

        x = self._conv(x, 32, 3, 2, "stem_conv")
        x = self._bn(x, "stem_bn", train)
        x = jax.nn.relu6(x)
        stride = 2
        for si, (t, c, reps, s) in enumerate(_MBV2_STAGES):
            if s == 2:
                skips[stride] = x
                stride *= 2
            for ri in range(reps):
                x = inverted_residual(x, t, c, s if ri == 0 else 1, f"block{si + 1}_{ri + 1}")
        x = self._conv(x, 1280, 1, 1, "top_conv")
        x = self._bn(x, "top_bn", train)
        x = jax.nn.relu6(x)
        return x, skips

    def _efficientnet(self, x, train):
        width_mult, depth_mult = _EFFNET_SCALING[self.encoder]
        skips = {}

        def se(x, f_in, name):
            f_se = max(1, int(f_in * 0.25))
            s = jnp.mean(x, axis=(1, 2), keepdims=True)
            s = nn.Conv(f_se, (1, 1), dtype=self.compute_dtype, name=f"{name}_se_reduce")(s)
            s = jax.nn.silu(s)
            s = nn.Conv(x.shape[-1], (1, 1), dtype=self.compute_dtype, name=f"{name}_se_expand")(s)
            return x * jax.nn.sigmoid(s)

        def mbconv(x, t, c, s, k, name):
            f_in = x.shape[-1]
            out = x
            if t != 1:
                out = self._conv(out, f_in * t, 1, 1, f"{name}_expand")
                out = self._bn(out, f"{name}_expand_bn", train)
                out = jax.nn.silu(out)
            out = self._conv(out, out.shape[-1], k, s, f"{name}_dw", groups=out.shape[-1])
            out = self._bn(out, f"{name}_dw_bn", train)
            out = jax.nn.silu(out)
            out = se(out, f_in, name)
            out = self._conv(out, c, 1, 1, f"{name}_project")
            out = self._bn(out, f"{name}_project_bn", train)
            if s == 1 and f_in == c:
                out = out + x
            return out

        x = self._conv(x, _round_filters(32, width_mult), 3, 2, "stem_conv")
        x = self._bn(x, "stem_bn", train)
        x = jax.nn.silu(x)
        stride = 2
        for si, (t, c, reps, s, k) in enumerate(_EFFNET_STAGES):
            c = _round_filters(c, width_mult)
            if s == 2:
                skips[stride] = x
                stride *= 2
            for ri in range(_round_repeats(reps, depth_mult)):
                x = mbconv(x, t, c, s if ri == 0 else 1, k, f"block{si + 1}{chr(97 + ri)}")
        x = self._conv(x, _round_filters(1280, width_mult), 1, 1, "top_conv")
        x = self._bn(x, "top_bn", train)
        x = jax.nn.silu(x)
        return x, skips

    def _densenet(self, x, train):
        growth = 32
        skips = {}

        def dense_layer(x, name):
            out = self._bn(x, f"{name}_bn1", train)
            out = apply_activation(out, "relu")
            out = self._conv(out, 4 * growth, 1, 1, f"{name}_conv1")
            out = self._bn(out, f"{name}_bn2", train)
            out = apply_activation(out, "relu")
            out = self._conv(out, growth, 3, 1, f"{name}_conv2")
            return jnp.concatenate([x, out], axis=-1)

        x = self._conv(x, 64, 7, 2, "stem_conv")
        x = self._bn(x, "stem_bn", train)
        x = apply_activation(x, "relu")
        skips[2] = x
        x = max_pool_same(x, 2, pool_size=3)
        stride = 4
        for bi, n_layers in enumerate(_DENSENET_BLOCKS[self.encoder]):
            for li in range(n_layers):
                x = dense_layer(x, f"block{bi + 1}_layer{li + 1}")
            if bi < 3:
                # Transition: BN + ReLU + 1x1 conv (halve) + avgpool/2.
                x = self._bn(x, f"trans{bi + 1}_bn", train)
                x = apply_activation(x, "relu")
                skips[stride] = x
                x = self._conv(x, x.shape[-1] // 2, 1, 1, f"trans{bi + 1}_conv")
                x = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")
                stride *= 2
        x = self._bn(x, "final_bn", train)
        x = apply_activation(x, "relu")
        return x, skips

    # ------------------------------------------------------------------ #
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.compute_dtype)
        if x.shape[-1] == 1:
            # Tile grayscale to RGB (reference pretrained_encoders.py:206).
            x = jnp.tile(x, (1, 1, 1, 3))

        if self.encoder in _RESNET_SPECS:
            enc_fn = self._resnet
        elif self.encoder in _VGG_REPS:
            enc_fn = self._vgg
        elif self.encoder in _DENSENET_BLOCKS:
            enc_fn = self._densenet
        elif self.encoder in _EFFNET_SCALING:
            enc_fn = self._efficientnet
        elif self.encoder == "mobilenetv2":
            enc_fn = self._mobilenetv2
        elif self.encoder == "mobilenet":
            enc_fn = self._mobilenetv1
        else:
            raise ValueError(f"Unknown encoder {self.encoder!r}")
        x, skips = enc_fn(x, train)

        # Decoder (sm Unet "upsampling" blocks): up x2 -> concat skip ->
        # (conv3x3 + BN + ReLU) x2; the stride-1 block has no skip.
        dec_feats: List[IntermediateFeature] = []
        stride = 32
        for i, f in enumerate(self.decoder_filters):
            x = upsample(x, 2, "nearest")
            stride //= 2
            if stride in skips:
                x = jnp.concatenate([x, skips[stride]], axis=-1)
            for sub in ("a", "b"):
                x = self._conv(
                    x, f, 3, 1, f"decoder_stage{i}{sub}_conv",
                    use_bias=not self.decoder_batchnorm,
                )
                if self.decoder_batchnorm:
                    x = self._bn(x, f"decoder_stage{i}{sub}_bn", train)
                x = apply_activation(x, "relu")
            dec_feats.append(IntermediateFeature(x, stride))

        return [x], [dec_feats]


@attr.s(auto_attribs=True, frozen=True)
class UnetPretrainedEncoder:
    """Backbone descriptor consumed by :class:`~sleap_tpu.models.model.Model`.

    Mirrors reference ``UnetPretrainedEncoder`` (pretrained_encoders.py:98):
    ``maximum_stride`` is 32, ``output_stride = 2 ** (5 - len(decoder_filters))``.
    """

    encoder: str = "efficientnetb0"
    decoder_filters: tuple = (256, 256, 128, 128)
    pretrained: bool = True
    decoder_batchnorm: bool = True

    @property
    def maximum_stride(self) -> int:
        return 32

    @property
    def down_blocks(self) -> int:
        return 5

    @property
    def up_blocks(self) -> int:
        return len(self.decoder_filters)

    @property
    def output_stride(self) -> int:
        return int(2 ** (self.down_blocks - self.up_blocks))

    @classmethod
    def from_config(cls, config: PretrainedEncoderConfig) -> "UnetPretrainedEncoder":
        if config.encoder not in AVAILABLE_ENCODERS:
            hint = UNSUPPORTED_ENCODER_HINTS.get(config.encoder)
            if hint:
                raise ValueError(
                    f"Encoder {config.encoder!r} has no native flax rebuild; "
                    f"the nearest supported family is {hint!r} — update the "
                    "config's model.backbone.pretrained_encoder.encoder. "
                    "(Converted weights for supported families load via "
                    "sleap_tpu.models.convert_pretrained + "
                    "$SLEAP_TPU_PRETRAINED_DIR.)"
                )
            raise ValueError(
                f"Unsupported encoder {config.encoder!r}; available: "
                f"{AVAILABLE_ENCODERS}. (The reference's full zoo is in "
                "segmentation_models; these are the native flax rebuilds.)"
            )
        up_blocks = int(np.log2(32 // config.output_stride))
        decoder_filters = tuple(
            int(config.decoder_filters * (config.decoder_filters_rate ** i))
            for i in range(up_blocks)
        )
        return cls(
            encoder=config.encoder,
            pretrained=config.pretrained,
            decoder_filters=decoder_filters,
            decoder_batchnorm=config.decoder_batchnorm,
        )

    def make_module(self, head_specs: tuple, compute_dtype=jnp.float32):
        from sleap_tpu.models.model import BackboneWithHeads

        return BackboneWithHeads(
            backbone_module=UnetPretrainedEncoderModule(
                encoder=self.encoder,
                decoder_filters=self.decoder_filters,
                decoder_batchnorm=self.decoder_batchnorm,
                compute_dtype=compute_dtype,
            ),
            backbone_output_stride=self.output_stride,
            head_specs=head_specs,
            compute_dtype=compute_dtype,
        )

    def init_weights_hook(self, variables: Dict) -> Dict:
        """Load local pretrained encoder weights if available (download gate).

        Looks for ``$SLEAP_TPU_PRETRAINED_DIR/<encoder>.npz`` — a file of
        arrays keyed by ``/``-joined flax param paths (e.g.
        ``backbone/backbone_module/stem_conv/kernel``). Missing/mismatched
        entries are left at random init. Returns the (possibly updated)
        variables.
        """
        if not self.pretrained:
            return variables
        root = os.environ.get("SLEAP_TPU_PRETRAINED_DIR", "")
        path = os.path.join(root, f"{self.encoder}.npz") if root else ""
        if not (path and os.path.exists(path)):
            logger.warning(
                "pretrained=True but no local weights found (%s); ImageNet "
                "downloads are unavailable offline — using random init. Set "
                "SLEAP_TPU_PRETRAINED_DIR to a folder of converted .npz weights.",
                path or "$SLEAP_TPU_PRETRAINED_DIR unset",
            )
            return variables
        return load_local_encoder_weights(variables, path)


def load_local_encoder_weights(variables: Dict, npz_path: str) -> Dict:
    """Merge a local ``.npz`` of named arrays into a flax variables tree.

    Names are ``/``-joined flax paths WITHOUT the collection prefix; both
    ``params`` (kernel/bias/scale) and ``batch_stats`` (BatchNorm running
    mean/var) collections are matched — their leaf names never collide.
    Produce these files with :mod:`sleap_tpu.models.convert_pretrained`.
    """
    import flax

    arrays = np.load(npz_path)
    flat = flax.traverse_util.flatten_dict(variables)
    n_loaded = 0
    for key, value in list(flat.items()):
        name = "/".join(str(k) for k in key[1:])  # drop the collection name
        if key[0] not in ("params", "batch_stats") or name not in arrays.files:
            continue
        arr = arrays[name]
        if arr.shape != value.shape:
            logger.warning("Shape mismatch for %s: %s vs %s", name, arr.shape, value.shape)
            continue
        flat[key] = jnp.asarray(arr, dtype=value.dtype)
        n_loaded += 1
    logger.info("Loaded %d/%d params from %s", n_loaded, len(flat), npz_path)
    return flax.traverse_util.unflatten_dict(flat)
