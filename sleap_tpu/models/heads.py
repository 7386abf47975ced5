"""Output head descriptors.

Rebuild of ``/root/reference/sleap/nn/heads.py:20`` — each head is a 1x1 conv
(or FC stack for class vectors) attached to the backbone feature whose stride
matches ``output_stride``. Heads are host-side attrs descriptors; the flax
module in :mod:`sleap_tpu.models.model` applies them.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Text, Tuple

import attr

from sleap_tpu import config as cfg


@attr.s(auto_attribs=True)
class Head:
    """Base head: defines channels, activation, and loss."""

    output_stride: int = 1
    loss_weight: float = 1.0

    @property
    def name(self) -> str:
        return type(self).__name__

    @property
    def channels(self) -> int:
        raise NotImplementedError

    @property
    def activation(self) -> str:
        return "linear"

    @property
    def loss_function(self) -> str:
        return "mse"


@attr.s(auto_attribs=True)
class SingleInstanceConfmapsHead(Head):
    part_names: List[Text] = attr.ib(factory=list)
    sigma: float = 5.0
    output_stride: int = 1
    loss_weight: float = 1.0

    @property
    def channels(self) -> int:
        return len(self.part_names)

    @classmethod
    def from_config(
        cls, config: cfg.SingleInstanceConfmapsHeadConfig, part_names=None
    ) -> "SingleInstanceConfmapsHead":
        return cls(
            part_names=part_names or config.part_names,
            sigma=config.sigma,
            output_stride=config.output_stride,
            loss_weight=config.loss_weight,
        )


@attr.s(auto_attribs=True)
class CentroidConfmapsHead(Head):
    anchor_part: Optional[Text] = None
    sigma: float = 5.0
    output_stride: int = 1
    loss_weight: float = 1.0

    @property
    def channels(self) -> int:
        return 1

    @classmethod
    def from_config(cls, config: cfg.CentroidsHeadConfig) -> "CentroidConfmapsHead":
        return cls(
            anchor_part=config.anchor_part,
            sigma=config.sigma,
            output_stride=config.output_stride,
            loss_weight=config.loss_weight,
        )


@attr.s(auto_attribs=True)
class CenteredInstanceConfmapsHead(Head):
    part_names: List[Text] = attr.ib(factory=list)
    anchor_part: Optional[Text] = None
    sigma: float = 5.0
    output_stride: int = 1
    loss_weight: float = 1.0

    @property
    def channels(self) -> int:
        return len(self.part_names)

    @classmethod
    def from_config(
        cls, config: cfg.CenteredInstanceConfmapsHeadConfig, part_names=None
    ) -> "CenteredInstanceConfmapsHead":
        return cls(
            part_names=part_names or config.part_names,
            anchor_part=config.anchor_part,
            sigma=config.sigma,
            output_stride=config.output_stride,
            loss_weight=config.loss_weight,
        )


@attr.s(auto_attribs=True)
class MultiInstanceConfmapsHead(Head):
    part_names: List[Text] = attr.ib(factory=list)
    sigma: float = 5.0
    output_stride: int = 1
    loss_weight: float = 1.0

    @property
    def channels(self) -> int:
        return len(self.part_names)

    @classmethod
    def from_config(
        cls, config: cfg.MultiInstanceConfmapsHeadConfig, part_names=None
    ) -> "MultiInstanceConfmapsHead":
        return cls(
            part_names=part_names or config.part_names,
            sigma=config.sigma,
            output_stride=config.output_stride,
            loss_weight=config.loss_weight,
        )


@attr.s(auto_attribs=True)
class PartAffinityFieldsHead(Head):
    edges: Sequence[Tuple[Text, Text]] = attr.ib(factory=list)
    sigma: float = 15.0
    output_stride: int = 1
    loss_weight: float = 1.0

    @property
    def channels(self) -> int:
        return len(self.edges) * 2

    @classmethod
    def from_config(
        cls, config: cfg.PartAffinityFieldsHeadConfig, edges=None
    ) -> "PartAffinityFieldsHead":
        return cls(
            edges=edges or config.edges,
            sigma=config.sigma,
            output_stride=config.output_stride,
            loss_weight=config.loss_weight,
        )


@attr.s(auto_attribs=True)
class ClassMapsHead(Head):
    classes: List[Text] = attr.ib(factory=list)
    sigma: float = 5.0
    output_stride: int = 1
    loss_weight: float = 1.0

    @property
    def channels(self) -> int:
        return len(self.classes)

    @property
    def activation(self) -> str:
        return "sigmoid"

    @classmethod
    def from_config(cls, config: cfg.ClassMapsHeadConfig, classes=None) -> "ClassMapsHead":
        return cls(
            classes=classes or config.classes,
            sigma=config.sigma,
            output_stride=config.output_stride,
            loss_weight=config.loss_weight,
        )


@attr.s(auto_attribs=True)
class ClassVectorsHead(Head):
    """Global classification head: pool -> FC stack -> softmax."""

    classes: List[Text] = attr.ib(factory=list)
    num_fc_layers: int = 1
    num_fc_units: int = 64
    global_pool: bool = True
    output_stride: int = 1
    loss_weight: float = 1.0

    @property
    def channels(self) -> int:
        return len(self.classes)

    @property
    def activation(self) -> str:
        return "softmax"

    @property
    def loss_function(self) -> str:
        return "categorical_crossentropy"

    @classmethod
    def from_config(
        cls, config: cfg.ClassVectorsHeadConfig, classes=None
    ) -> "ClassVectorsHead":
        return cls(
            classes=classes or config.classes,
            num_fc_layers=config.num_fc_layers,
            num_fc_units=config.num_fc_units,
            global_pool=config.global_pool,
            output_stride=config.output_stride,
            loss_weight=config.loss_weight,
        )


@attr.s(auto_attribs=True)
class OffsetRefinementHead(Head):
    """Learned subpixel offset maps: 2 channels per part (heads.py:472)."""

    part_names: List[Text] = attr.ib(factory=list)
    sigma_threshold: float = 0.2
    output_stride: int = 1
    loss_weight: float = 1.0

    @property
    def channels(self) -> int:
        return len(self.part_names) * 2

    @classmethod
    def from_config(cls, config, part_names=None) -> "OffsetRefinementHead":
        if part_names is None:
            if hasattr(config, "part_names") and config.part_names is not None:
                part_names = config.part_names
            elif hasattr(config, "anchor_part"):
                part_names = [config.anchor_part]  # centroid: one (possibly None) part
        return cls(
            part_names=part_names,
            output_stride=config.output_stride,
            loss_weight=getattr(config, "loss_weight", 1.0),
            sigma_threshold=getattr(config, "sigma_threshold", 0.2),
        )
