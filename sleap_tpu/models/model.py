"""Model assembly: backbone + heads -> flax module.

Rebuild of ``/root/reference/sleap/nn/model.py:90`` (``Model.from_config`` at
:104, ``make_model`` at :312). Heads attach to the backbone feature whose
stride matches their ``output_stride`` — the final decoder output or a
stride-tagged decoder intermediate — replicating the reference's attachment
rule exactly. For stacked backbones every stack gets its own head outputs
(intermediate supervision); non-final stacks are keyed ``{name}_stack{i}``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import attr
import flax.linen as nn
import jax
import jax.numpy as jnp

from sleap_tpu import config as cfg
from sleap_tpu.models.encoder_decoder import EncoderDecoderNet, apply_activation
from sleap_tpu.models.heads import (
    CenteredInstanceConfmapsHead,
    CentroidConfmapsHead,
    ClassMapsHead,
    ClassVectorsHead,
    Head,
    MultiInstanceConfmapsHead,
    OffsetRefinementHead,
    PartAffinityFieldsHead,
    SingleInstanceConfmapsHead,
)
from sleap_tpu.models.hourglass import Hourglass
from sleap_tpu.models.leap import LeapCNN
from sleap_tpu.models.unet import UNet


class PoseNet(nn.Module):
    """Backbone + heads as one jittable module.

    ``head_specs`` entries: (name, channels, activation, output_stride,
    kind, num_fc_layers, num_fc_units, global_pool) — all hashable.
    """

    stem_blocks: tuple = ()
    encoder_blocks: tuple = ()
    decoder_blocks: tuple = ()
    stacks: int = 1
    backbone_output_stride: int = 1
    head_specs: tuple = ()
    compute_dtype: Any = jnp.float32
    channels_first_heads: tuple = ()
    fold_s2d_stem: Any = None  # None -> encoder_decoder.FOLD_S2D_STEM

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        backbone = EncoderDecoderNet(
            stem_blocks=self.stem_blocks,
            encoder_blocks=self.encoder_blocks,
            decoder_blocks=self.decoder_blocks,
            stacks=self.stacks,
            compute_dtype=self.compute_dtype,
            fold_s2d_stem=self.fold_s2d_stem,
            name="backbone",
        )
        outputs, intermediates = backbone(x, train=train)

        return apply_heads(
            self, outputs, intermediates, self.head_specs,
            self.backbone_output_stride, self.compute_dtype,
            self.channels_first_heads,
        )


class BackboneWithHeads(nn.Module):
    """Arbitrary backbone module + stride-matched heads.

    Same head-attachment contract as :class:`PoseNet` but for backbones that
    are full flax modules (e.g. ResNet) rather than block-descriptor stacks.
    """

    backbone_module: nn.Module = None
    backbone_output_stride: int = 1
    head_specs: tuple = ()
    compute_dtype: Any = jnp.float32
    channels_first_heads: tuple = ()

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        outputs, intermediates = self.backbone_module(x, train=train)
        return apply_heads(
            self, outputs, intermediates, self.head_specs,
            self.backbone_output_stride, self.compute_dtype,
            self.channels_first_heads,
        )


class _ChannelsFirstConv1x1(nn.Module):
    """1x1 conv emitting (K, S, H, W) — param-tree identical to ``nn.Conv``.

    TPU layout experiment: computing the head as ``einsum('kc,shwc->kshw')``
    produces per-channel (H, W) planes as a native dot output, letting the
    peak finder skip its (S,H,W,C)->(S,C,H,W) relayout (+19% isolated).
    In the full bottom-up graph it measured 7% SLOWER (1510 vs 1620 FPS,
    batch 256 @1024² on the v5e): the einsum forfeits XLA's fusion of the
    1x1 head conv with the preceding refine conv. Kept as an opt-in
    (``channels_first_heads``) because other model shapes may rank
    differently. Kernel/bias shapes and initializers match ``nn.Conv``
    exactly so checkpoints load interchangeably.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (S, H, W, C) -> (K, S, H, W)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum(
            "kc,shwc->kshw",
            kernel[0, 0].T.astype(self.dtype),
            x.astype(self.dtype),
        )
        return y + bias.astype(self.dtype)[:, None, None, None]


def apply_heads(scope, outputs, intermediates, head_specs, backbone_output_stride, compute_dtype, channels_first_heads=()):
    """Attach 1x1-conv / FC heads at matching strides (reference model.py:312).

    Heads named in ``channels_first_heads`` emit (channels, samples, H, W)
    via :class:`_ChannelsFirstConv1x1` (inference-only layout optimization).
    """
    results: Dict[str, jnp.ndarray] = {}
    for spec in head_specs:
        (name, channels, activation, output_stride, kind,
         num_fc_layers, num_fc_units, global_pool) = spec
        for stack_i, (x_out, feats) in enumerate(zip(outputs, intermediates)):
            if output_stride == backbone_output_stride:
                x_head_in = x_out
            else:
                x_head_in = None
                for feat in feats:
                    if feat.stride == output_stride:
                        x_head_in = feat.tensor
                        break
                if x_head_in is None:
                    raise ValueError(
                        f"No feature at stride {output_stride} for head {name}."
                    )
            suffix = "" if stack_i == len(outputs) - 1 else f"_stack{stack_i}"
            if kind == "conv":
                if name in channels_first_heads:
                    y = _ChannelsFirstConv1x1(
                        features=channels, dtype=compute_dtype,
                        name=f"{name}{suffix}",
                    )(x_head_in)
                else:
                    y = nn.Conv(
                        features=channels, kernel_size=(1, 1), padding="SAME",
                        dtype=compute_dtype, name=f"{name}{suffix}",
                    )(x_head_in)
                y = apply_activation(y, activation)
            else:
                y = x_head_in
                if global_pool:
                    y = jnp.mean(y, axis=(1, 2))
                else:
                    y = y.reshape(y.shape[0], -1)
                # Layer names match the reference Keras graph
                # (heads.py:368 ClassVectorsHead.make_head) so its .h5
                # checkpoints load by name.
                for fc_i in range(num_fc_layers):
                    y = nn.Dense(
                        num_fc_units, dtype=compute_dtype,
                        name=f"pre_classification{fc_i}_fc{suffix}",
                    )(y)
                    y = jax.nn.relu(y)
                y = nn.Dense(channels, dtype=compute_dtype, name=f"{name}{suffix}")(y)
                y = apply_activation(y, activation)
            out_dtype = (
                jnp.float32 if compute_dtype == jnp.float32 else compute_dtype
            )
            results[f"{name}{suffix}"] = y.astype(out_dtype)
    return results


@attr.s(auto_attribs=True)
class Model:
    """A trainable/predictable model description (backbone + heads)."""

    backbone: Any
    heads: List[Head]

    @property
    def maximum_stride(self) -> int:
        return self.backbone.maximum_stride

    @property
    def output_stride(self) -> int:
        return self.backbone.output_stride

    @property
    def head_names(self) -> List[str]:
        return [h.name for h in self.heads]

    @classmethod
    def from_config(
        cls,
        config: cfg.ModelConfig,
        skeleton=None,
        tracks=None,
        update_config: bool = False,
    ) -> "Model":
        """Build backbone + heads from config, filling part names/edges/classes
        from the skeleton/tracks when unset (reference model.py:104-307)."""
        backbone_config = config.backbone.which_oneof
        if isinstance(backbone_config, cfg.UNetConfig):
            backbone = UNet.from_config(backbone_config)
        elif isinstance(backbone_config, cfg.LEAPConfig):
            backbone = LeapCNN.from_config(backbone_config)
        elif isinstance(backbone_config, cfg.HourglassConfig):
            backbone = Hourglass.from_config(backbone_config)
        elif isinstance(backbone_config, cfg.ResNetConfig):
            from sleap_tpu.models.resnet import ResNet

            backbone = ResNet.from_config(backbone_config)
        elif isinstance(backbone_config, cfg.HRNetConfig):
            from sleap_tpu.models.hrnet import HigherHRNet

            backbone = HigherHRNet.from_config(backbone_config)
        elif isinstance(backbone_config, cfg.PretrainedEncoderConfig):
            from sleap_tpu.models.pretrained_encoder import UnetPretrainedEncoder

            backbone = UnetPretrainedEncoder.from_config(backbone_config)
        elif backbone_config is None:
            raise ValueError("Backbone architecture was not specified.")
        else:
            raise NotImplementedError(
                f"Backbone {type(backbone_config).__name__} not yet supported."
            )

        def get_part_names(hc):
            names = getattr(hc, "part_names", None)
            if names is None:
                if skeleton is None:
                    raise ValueError("Skeleton required when head config incomplete.")
                names = skeleton.node_names
                if update_config:
                    hc.part_names = names
            return names

        def get_classes(hc):
            classes = hc.classes
            if classes is None:
                if tracks is None:
                    raise ValueError("Tracks required when classes unset.")
                classes = [t.name for t in tracks]
                if update_config:
                    hc.classes = classes
            return classes

        head_config = config.heads.which_oneof
        heads: List[Head] = []
        if isinstance(head_config, cfg.SingleInstanceConfmapsHeadConfig):
            part_names = get_part_names(head_config)
            heads.append(
                SingleInstanceConfmapsHead.from_config(head_config, part_names=part_names)
            )
            if head_config.offset_refinement:
                heads.append(
                    OffsetRefinementHead.from_config(head_config, part_names=part_names)
                )
        elif isinstance(head_config, cfg.CentroidsHeadConfig):
            heads.append(CentroidConfmapsHead.from_config(head_config))
            if head_config.offset_refinement:
                heads.append(OffsetRefinementHead.from_config(head_config))
        elif isinstance(head_config, cfg.CenteredInstanceConfmapsHeadConfig):
            part_names = get_part_names(head_config)
            heads.append(
                CenteredInstanceConfmapsHead.from_config(
                    head_config, part_names=part_names
                )
            )
            if head_config.offset_refinement:
                heads.append(
                    OffsetRefinementHead.from_config(head_config, part_names=part_names)
                )
        elif isinstance(head_config, cfg.MultiInstanceConfig):
            part_names = get_part_names(head_config.confmaps)
            edges = head_config.pafs.edges
            if edges is None:
                if skeleton is None:
                    raise ValueError("Skeleton required when head config incomplete.")
                edges = skeleton.edge_names
                if update_config:
                    head_config.pafs.edges = edges
            heads.append(
                MultiInstanceConfmapsHead.from_config(
                    head_config.confmaps, part_names=part_names
                )
            )
            heads.append(PartAffinityFieldsHead.from_config(head_config.pafs, edges=edges))
            if head_config.confmaps.offset_refinement:
                heads.append(
                    OffsetRefinementHead.from_config(
                        head_config.confmaps, part_names=part_names
                    )
                )
        elif isinstance(head_config, cfg.MultiClassBottomUpConfig):
            part_names = get_part_names(head_config.confmaps)
            classes = get_classes(head_config.class_maps)
            heads.append(
                MultiInstanceConfmapsHead.from_config(
                    head_config.confmaps, part_names=part_names
                )
            )
            heads.append(
                ClassMapsHead.from_config(head_config.class_maps, classes=classes)
            )
            if head_config.confmaps.offset_refinement:
                heads.append(
                    OffsetRefinementHead.from_config(
                        head_config.confmaps, part_names=part_names
                    )
                )
        elif isinstance(head_config, cfg.MultiClassTopDownConfig):
            part_names = get_part_names(head_config.confmaps)
            classes = get_classes(head_config.class_vectors)
            heads.append(
                CenteredInstanceConfmapsHead.from_config(
                    head_config.confmaps, part_names=part_names
                )
            )
            heads.append(
                ClassVectorsHead.from_config(head_config.class_vectors, classes=classes)
            )
            if head_config.confmaps.offset_refinement:
                heads.append(
                    OffsetRefinementHead.from_config(
                        head_config.confmaps, part_names=part_names
                    )
                )
        elif head_config is None:
            raise ValueError("Head type (config.model.heads) was not specified.")
        else:
            raise NotImplementedError(f"Head {type(head_config).__name__} unsupported.")

        return cls(backbone=backbone, heads=heads)

    # ------------------------------------------------------------------ #
    def make_flax_module(self, compute_dtype=jnp.float32) -> PoseNet:
        head_specs = tuple(
            (
                h.name,
                h.channels,
                h.activation,
                h.output_stride,
                "dense" if isinstance(h, ClassVectorsHead) else "conv",
                getattr(h, "num_fc_layers", 0),
                getattr(h, "num_fc_units", 0),
                getattr(h, "global_pool", True),
            )
            for h in self.heads
        )
        if hasattr(self.backbone, "make_module"):
            return self.backbone.make_module(head_specs, compute_dtype=compute_dtype)
        return PoseNet(
            stem_blocks=self.backbone.make_stem_blocks(),
            encoder_blocks=self.backbone.make_encoder_blocks(),
            decoder_blocks=self.backbone.make_decoder_blocks(),
            stacks=getattr(self.backbone, "stacks", 1),
            backbone_output_stride=self.backbone.output_stride,
            head_specs=head_specs,
            compute_dtype=compute_dtype,
            fold_s2d_stem=getattr(self.backbone, "fold_s2d_stem", None),
        )

    def init(self, rng, input_shape: Tuple[int, int, int], compute_dtype=jnp.float32):
        """Initialize variables for input (height, width, channels)."""
        module = self.make_flax_module(compute_dtype)
        x = jnp.zeros((1, *input_shape), jnp.float32)
        variables = module.init(rng, x, train=False)
        if hasattr(self.backbone, "init_weights_hook"):
            variables = self.backbone.init_weights_hook(variables)
        return module, variables


def find_head(outputs: Dict[str, jnp.ndarray], name_substring: str) -> Optional[str]:
    """Locate an output key by head-name substring (reference inference.py:1204).

    Prefers final-stack outputs (keys without the ``_stack`` suffix).
    """
    keys = [k for k in outputs if name_substring in k and "_stack" not in k]
    if keys:
        return keys[0]
    keys = [k for k in outputs if name_substring in k]
    return keys[0] if keys else None
