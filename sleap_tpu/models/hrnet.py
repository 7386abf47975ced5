"""(Higher)HRNet backbone.

Rebuild of ``/root/reference/sleap/nn/architectures/hrnet.py`` (HigherHRNet
at :576, trunk at :495, fuse layers at :284, deconv heads at :400) as a flax
module. The reference keeps this experimental and does not expose it in
``BackboneConfig``; here it is a first-class backbone (``hrnet`` oneof in
:class:`sleap_tpu.config.BackboneConfig`) following the same multi-resolution
design:

- stem: ``initial_downsampling_steps`` strided 3x3 convs
- stage 1: four residual blocks at the stem resolution, projected to ``C``
- stages 2-4: parallel branches at strides (S, 2S, 4S, 8S) with channel
  widths (C, 2C, 4C, 8C), repeated modules, and all-to-all fusion (strided
  convs downward, 1x1 conv + nearest upsample upward)
- HigherHRNet deconv modules: transposed-conv (or bilinear) 2x upsampling
  stages after the trunk, each followed by residual refinement blocks,
  yielding features at successively finer strides for high-resolution heads.

One adaptation: the reference's deconv modules concatenate the previous
*head output map* into the deconv input (hrnet.py:545-560, a HigherHRNet
detail that entangles the backbone with head channels). Here the deconv
modules consume feature maps only and heads attach by stride through the
standard ``apply_heads`` contract, which keeps the backbone head-agnostic.
All blocks run in ``compute_dtype`` (bfloat16 on TPU) with f32 BatchNorm
statistics.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import attr
import flax.linen as nn
import jax
import jax.numpy as jnp

from sleap_tpu.models.common import IntermediateFeature


def _conv(x, filters, kernel, stride, dtype, name_scope, bn=True, act=True, train=False):
    """3x3/1x1 conv -> BN -> relu helper used across the HRNet graph."""
    x = nn.Conv(
        features=filters,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding="SAME",
        use_bias=not bn,
        dtype=dtype,
        name=f"{name_scope}_conv",
    )(x)
    if bn:
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=jnp.float32,
            name=f"{name_scope}_bn",
        )(x.astype(jnp.float32)).astype(dtype)
    if act:
        x = nn.relu(x)
    return x


class HigherHRNetModule(nn.Module):
    """Multi-resolution HRNet trunk + HigherHRNet deconv upsampling."""

    C: int = 18
    initial_downsampling_steps: int = 2
    n_deconv_modules: int = 1
    bottleneck: bool = False
    deconv_filters: int = 256
    bilinear_upsampling: bool = False
    stem_filters: int = 64
    compute_dtype: Any = jnp.float32

    def _residual_block(self, x, filters, scope, train):
        dt = self.compute_dtype
        residual = x
        if self.bottleneck:
            y = _conv(x, filters, 1, 1, dt, f"{scope}_in", train=train)
            y = _conv(y, filters, 3, 1, dt, f"{scope}_3x3", train=train)
            y = _conv(y, filters, 1, 1, dt, f"{scope}_expand", act=False, train=train)
        else:
            y = _conv(x, filters, 3, 1, dt, f"{scope}_c1", train=train)
            y = _conv(y, filters, 3, 1, dt, f"{scope}_c2", act=False, train=train)
        if residual.shape[-1] != y.shape[-1]:
            residual = _conv(
                residual, y.shape[-1], 1, 1, dt, f"{scope}_proj", act=False, train=train
            )
        return nn.relu(residual + y)

    def _branch(self, x, filters, blocks, scope, train):
        for b in range(blocks):
            x = self._residual_block(x, filters, f"{scope}_blk{b}", train)
        return x

    def _down(self, x, steps, out_filters, scope, relu_last, train):
        dt = self.compute_dtype
        in_filters = x.shape[-1]
        for s in range(steps - 1):
            x = _conv(x, in_filters, 3, 2, dt, f"{scope}_d{s}", train=train)
        return _conv(
            x, out_filters, 3, 2, dt, f"{scope}_d{steps - 1}",
            act=relu_last, train=train,
        )

    def _up(self, x, steps, out_filters, scope, train):
        dt = self.compute_dtype
        x = _conv(x, out_filters, 1, 1, dt, f"{scope}_1x1", act=False, train=train)
        f = 2 ** steps
        # Nearest-neighbor upsample (reference UpSampling2D default).
        x = jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)
        return x

    def _fuse(self, branches, scope, single_scale, train):
        n_out = 1 if single_scale else len(branches)
        fused = []
        for i in range(n_out):
            acc = branches[i]
            tf_ = acc.shape[-1]
            for j, src in enumerate(branches):
                if j == i:
                    continue
                if j > i:
                    src = self._up(src, j - i, tf_, f"{scope}_f{j}to{i}", train)
                else:
                    src = self._down(
                        src, i - j, tf_, f"{scope}_f{j}to{i}", False, train
                    )
                acc = acc + src
            fused.append(nn.relu(acc))
        return fused

    def _stage(self, branches, widths, modules, blocks, scope, single_scale, train):
        # Transition: width-match existing branches, spawn new ones downward.
        ins = []
        for t, w in enumerate(widths):
            if t < len(branches):
                src = branches[t]
                ins.append(
                    src if src.shape[-1] == w
                    else _conv(src, w, 3, 1, self.compute_dtype,
                               f"{scope}_tr{t}", train=train)
                )
            else:
                ins.append(
                    self._down(
                        branches[-1], t - (len(branches) - 1), w,
                        f"{scope}_tr{t}", True, train,
                    )
                )
        for m in range(modules):
            outs = [
                self._branch(x, w, blocks, f"{scope}_m{m}_b{i}", train)
                for i, (x, w) in enumerate(zip(ins, widths))
            ]
            if len(outs) > 1:
                last = m == modules - 1
                outs = self._fuse(outs, f"{scope}_m{m}", single_scale and last, train)
            ins = outs
        return ins

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[list, list]:
        dt = self.compute_dtype
        x = x.astype(dt)

        # Stem: repeated stride-2 convs; relu only after the last.
        for s in range(self.initial_downsampling_steps):
            last = s == self.initial_downsampling_steps - 1
            x = _conv(x, self.stem_filters, 3, 2, dt, f"stem{s}", act=last, train=train)
        trunk_stride = 2 ** self.initial_downsampling_steps

        # Stage 1: residual blocks at full trunk resolution -> project to C.
        x = self._branch(x, 64, 4, "stage1", train)
        x = _conv(x, self.C, 3, 1, dt, "stage1_out", act=False, train=train)

        C = self.C
        branches = self._stage([x], (C, 2 * C), 1, 4, "stage2", False, train)
        branches = self._stage(branches, (C, 2 * C, 4 * C), 4, 4, "stage3", False, train)
        branches = self._stage(
            branches, (C, 2 * C, 4 * C, 8 * C), 3, 4, "stage4", True, train
        )
        feats = branches[0]  # single-scale output at trunk_stride

        intermediates: List[IntermediateFeature] = [
            IntermediateFeature(feats, trunk_stride)
        ]
        stride = trunk_stride
        for d in range(self.n_deconv_modules):
            if self.bilinear_upsampling:
                n, h, w, c = feats.shape
                feats = jax.image.resize(
                    feats, (n, h * 2, w * 2, c), method="bilinear"
                )
            else:
                feats = nn.ConvTranspose(
                    features=self.deconv_filters,
                    kernel_size=(4, 4),
                    strides=(2, 2),
                    padding="SAME",
                    use_bias=False,
                    dtype=dt,
                    name=f"deconv{d}",
                )(feats)
                feats = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, dtype=jnp.float32,
                    name=f"deconv{d}_bn",
                )(feats.astype(jnp.float32)).astype(dt)
                feats = nn.relu(feats)
            for b in range(4):
                feats = self._residual_block(feats, 32, f"deconv{d}_blk{b}", train)
            stride //= 2
            intermediates.append(IntermediateFeature(feats, stride))

        # Contract: (stack outputs, per-stack intermediates).
        return [feats], [intermediates[:-1]]


@attr.s(auto_attribs=True, frozen=True)
class HigherHRNet:
    """Backbone descriptor consumed by :class:`sleap_tpu.models.model.Model`."""

    C: int = 18
    initial_downsampling_steps: int = 2
    n_deconv_modules: int = 1
    bottleneck: bool = False
    deconv_filters: int = 256
    bilinear_upsampling: bool = False
    stem_filters: int = 64

    @property
    def maximum_stride(self) -> int:
        # Trunk branches reach 8x the stem stride (stage 4's deepest branch).
        return (2 ** self.initial_downsampling_steps) * 8

    @property
    def output_stride(self) -> int:
        return 2 ** (self.initial_downsampling_steps - self.n_deconv_modules)

    def make_module(self, head_specs: tuple, compute_dtype=jnp.float32):
        from sleap_tpu.models.model import BackboneWithHeads

        return BackboneWithHeads(
            backbone_module=HigherHRNetModule(
                C=self.C,
                initial_downsampling_steps=self.initial_downsampling_steps,
                n_deconv_modules=self.n_deconv_modules,
                bottleneck=self.bottleneck,
                deconv_filters=self.deconv_filters,
                bilinear_upsampling=self.bilinear_upsampling,
                stem_filters=self.stem_filters,
                compute_dtype=compute_dtype,
            ),
            backbone_output_stride=self.output_stride,
            head_specs=head_specs,
            compute_dtype=compute_dtype,
        )

    @classmethod
    def from_config(cls, config) -> "HigherHRNet":
        return cls(
            C=config.C,
            initial_downsampling_steps=config.initial_downsampling_steps,
            n_deconv_modules=config.n_deconv_modules,
            bottleneck=config.bottleneck,
            deconv_filters=config.deconv_filters,
            bilinear_upsampling=config.bilinear_upsampling,
            stem_filters=config.stem_filters,
        )
