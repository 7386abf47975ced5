"""ResNetV1 backbone with an upsampling-stack decoder (flax).

Rebuild of ``/root/reference/sleap/nn/architectures/resnet.py``
(``ResNetv1:364``, ``ResNet50/101/152:544-652``) and ``upsampling.py:23``
(``UpsamplingStack``). The encoder is standard bottleneck ResNetV1; strided
stacks beyond the target ``max_stride`` become dilated convolutions
(reference ``make_backbone_fn:256``), and the decoder is a configurable
transposed-conv/interp upsampling stack with add/concat skips.

ImageNet-pretrained weights are not available in this offline environment:
``weights="random"`` is fully supported; pretrained modes raise with a clear
message (reference parity requires downloading Keras applications weights).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import attr
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sleap_tpu.config import ResNetConfig, UpsamplingConfig
from sleap_tpu.models.common import IntermediateFeature
from sleap_tpu.models.encoder_decoder import apply_activation, max_pool_same, upsample

_STACK_BLOCKS = {
    "ResNet50": (3, 4, 6, 3),
    "ResNet101": (3, 4, 23, 3),
    "ResNet152": (3, 8, 36, 3),
}


class ResNetV1Module(nn.Module):
    """Bottleneck ResNetV1 encoder + UpsamplingStack decoder.

    Returns ``(outputs, intermediates)`` with the same contract as
    :class:`~sleap_tpu.models.encoder_decoder.EncoderDecoderNet`.
    """

    version: str = "ResNet50"
    max_stride: int = 32
    output_stride: int = 4
    up_blocks_spec: tuple = ()  # tuples: (filters, transposed, kernel, refine_convs, refine_filters, batch_norm, skip_connections)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.compute_dtype)

        def bn(x, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-5,
                dtype=self.compute_dtype, name=name,
            )(x)

        def conv(x, f, k, s, name, dilation=1):
            return nn.Conv(
                f, (k, k), strides=(s, s), padding="SAME",
                kernel_dilation=(dilation, dilation), use_bias=False,
                dtype=self.compute_dtype, name=name,
            )(x)

        def bottleneck(x, filters, stride, dilation, name):
            shortcut = x
            out = conv(x, filters, 1, stride, f"{name}_conv1")
            out = bn(out, f"{name}_bn1")
            out = apply_activation(out, "relu")
            out = conv(out, filters, 3, 1, f"{name}_conv2", dilation=dilation)
            out = bn(out, f"{name}_bn2")
            out = apply_activation(out, "relu")
            out = conv(out, filters * 4, 1, 1, f"{name}_conv3")
            out = bn(out, f"{name}_bn3")
            if shortcut.shape[-1] != filters * 4 or stride != 1:
                shortcut = conv(x, filters * 4, 1, stride, f"{name}_proj")
                shortcut = bn(shortcut, f"{name}_proj_bn")
            return apply_activation(out + shortcut, "relu")

        intermediates: List[IntermediateFeature] = []

        # Stem: conv7x7/2 + maxpool/2.
        x = conv(x, 64, 7, 2, "stem_conv")
        x = bn(x, "stem_bn")
        x = apply_activation(x, "relu")
        current_stride = 2
        intermediates.append(IntermediateFeature(x, current_stride))
        x = max_pool_same(x, 2, pool_size=3)
        current_stride = 4

        # Stages with dilation past max_stride (reference resnet.py:256).
        n_blocks = _STACK_BLOCKS[self.version]
        filters = (64, 128, 256, 512)
        dilation = 1
        for si, (f, nb) in enumerate(zip(filters, n_blocks)):
            stride1 = 1 if si == 0 else 2
            if stride1 > 1:
                if current_stride < self.max_stride:
                    current_stride *= stride1
                else:
                    dilation *= 2
                    stride1 = 1
            for bi in range(nb):
                s = stride1 if bi == 0 else 1
                x = bottleneck(x, f, s, dilation, f"stage{si}_block{bi}")
            if not any(feat.stride == current_stride for feat in intermediates):
                intermediates.append(IntermediateFeature(x, current_stride))

        # Decoder: upsampling stack down to output_stride.
        dec_feats: List[IntermediateFeature] = []
        for ui, spec in enumerate(self.up_blocks_spec):
            (filters_u, transposed, kernel, refine_convs, refine_filters,
             batch_norm, skip_mode) = spec
            dec_feats.append(IntermediateFeature(x, current_stride))
            next_stride = current_stride // 2
            if transposed:
                x = nn.ConvTranspose(
                    int(filters_u), (kernel, kernel), strides=(2, 2), padding="SAME",
                    dtype=self.compute_dtype, name=f"up{ui}_trans_conv",
                )(x)
                if batch_norm:
                    x = bn(x, f"up{ui}_trans_bn")
                x = apply_activation(x, "relu")
            else:
                x = upsample(x, 2, "bilinear")
            if skip_mode:
                skip = None
                for feat in intermediates:
                    if feat.stride == next_stride:
                        skip = feat.tensor
                        break
                if skip is not None:
                    if skip_mode == "add":
                        if skip.shape[-1] != x.shape[-1]:
                            skip = nn.Conv(
                                x.shape[-1], (1, 1), dtype=self.compute_dtype,
                                name=f"up{ui}_skip_proj",
                            )(skip)
                        x = x + skip
                    else:
                        x = jnp.concatenate([skip, x], axis=-1)
            for ri in range(refine_convs):
                x = nn.Conv(
                    int(refine_filters), (3, 3), padding="SAME",
                    dtype=self.compute_dtype, name=f"up{ui}_refine{ri}",
                )(x)
                if batch_norm:
                    x = bn(x, f"up{ui}_refine{ri}_bn")
                x = apply_activation(x, "relu")
            current_stride = next_stride

        return [x], [dec_feats]


@attr.s(auto_attribs=True, frozen=True)
class ResNet:
    """Backbone descriptor consumed by :class:`~sleap_tpu.models.model.Model`."""

    version: str = "ResNet50"
    weights: str = "random"
    max_stride: int = 32
    output_stride: int = 4
    upsampling: Optional[tuple] = None  # hashable UpsamplingConfig summary
    stacks: int = 1

    @property
    def maximum_stride(self) -> int:
        return self.max_stride

    def up_blocks_spec(self) -> tuple:
        n_ups = int(np.log2(self.max_stride / self.output_stride))
        if self.upsampling is None:
            # Defaults from UpsamplingConfig.
            return tuple(
                (64, True, 4, 2, 64, True, None) for _ in range(n_ups)
            )
        (method, skip_connections, filters, filters_rate,
         refine_convs, batch_norm, kernel) = self.upsampling
        specs = []
        f = filters
        for _ in range(n_ups):
            specs.append(
                (
                    int(f),
                    method == "transposed_conv",
                    kernel,
                    refine_convs,
                    int(f),
                    batch_norm,
                    skip_connections,
                )
            )
            f *= filters_rate
        return tuple(specs)

    def make_module(self, head_specs: tuple, compute_dtype=jnp.float32):
        from sleap_tpu.models.model import BackboneWithHeads

        return BackboneWithHeads(
            backbone_module=ResNetV1Module(
                version=self.version,
                max_stride=self.max_stride,
                output_stride=self.output_stride,
                up_blocks_spec=self.up_blocks_spec(),
                compute_dtype=compute_dtype,
            ),
            backbone_output_stride=self.output_stride,
            head_specs=head_specs,
            compute_dtype=compute_dtype,
        )

    @classmethod
    def from_config(cls, config: ResNetConfig) -> "ResNet":
        if config.weights != "random":
            raise NotImplementedError(
                "ImageNet-pretrained ResNet weights are unavailable offline; "
                "use weights='random' or provide a base_checkpoint."
            )
        upsampling = None
        if config.upsampling is not None:
            u = config.upsampling
            upsampling = (
                u.method
                if u.method in ("transposed_conv", "interpolation")
                else "interpolation",
                u.skip_connections,
                u.filters,
                u.filters_rate,
                u.refine_convs,
                u.batch_norm,
                u.transposed_conv_kernel_size,
            )
        return cls(
            version=config.version,
            weights=config.weights,
            max_stride=config.max_stride,
            output_stride=config.output_stride,
            upsampling=upsampling,
        )
