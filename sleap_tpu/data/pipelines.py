"""Task-specific data pipeline builders.

Reference analog: ``/root/reference/sleap/nn/data/pipelines.py`` (six
builders at :334-1262 composing ~30 tf.data transformer blocks). The
TPU-native architecture collapses those block chains: providers stay on the
host (decode + batch assembly + threaded prefetch) and every per-example
transform (normalize, augment, resize, crop, GT codec generation) runs
*inside the jitted train/infer step* (see
:mod:`sleap_tpu.training.trainer` ``build_gt_fn`` per head type).

This module provides the same entry-point names so code written against the
reference's builder API maps over; each builder returns an iterator of
``(batch dict, n_valid)`` host batches plus the trainer class that owns the
on-chip transform chain.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional, Tuple

import attr

from sleap_tpu.core.labels import Labels
from sleap_tpu.data.prefetch import prefetch
from sleap_tpu.data.providers import LabelsReader, VideoReader, batch_examples


@attr.s(auto_attribs=True)
class Pipeline:
    """A provider + host batching + (on-chip) transform chain descriptor."""

    provider: Any
    batch_size: int = 4
    prefetch_buffer: int = 2

    def make_dataset(self) -> Iterator[Tuple[dict, int]]:
        """Iterate (batch, n_valid) with threaded prefetch."""
        return prefetch(
            batch_examples(self.provider, self.batch_size),
            buffer_size=self.prefetch_buffer,
        )

    __iter__ = make_dataset


def _trainer_for(head_name: str):
    from sleap_tpu.training import trainer as T

    return {
        "single_instance": T.SingleInstanceTrainer,
        "centroid": T.CentroidTrainer,
        "centered_instance": T.TopdownConfmapsTrainer,
        "multi_instance": T.BottomUpTrainer,
        "multi_class_bottomup": T.BottomUpMultiClassTrainer,
        "multi_class_topdown": T.TopDownMultiClassTrainer,
    }[head_name]


@attr.s(auto_attribs=True)
class _BasePipelineBuilder:
    """Shared builder surface (reference pipelines expose make_base_pipeline /
    make_training_pipeline / make_viz_pipeline)."""

    data_config: Any = None
    optimization_config: Any = None
    head_name: str = ""

    def make_base_pipeline(self, data_provider) -> Pipeline:
        batch = getattr(self.optimization_config, "batch_size", 4)
        return Pipeline(provider=data_provider, batch_size=batch)

    def make_training_pipeline(self, data_provider) -> Pipeline:
        return self.make_base_pipeline(data_provider)

    def make_viz_pipeline(self, data_provider) -> Pipeline:
        return Pipeline(provider=data_provider, batch_size=1)

    @property
    def trainer_cls(self):
        return _trainer_for(self.head_name)


@attr.s(auto_attribs=True)
class SingleInstanceConfmapsPipeline(_BasePipelineBuilder):
    head_name: str = "single_instance"


@attr.s(auto_attribs=True)
class CentroidConfmapsPipeline(_BasePipelineBuilder):
    head_name: str = "centroid"


@attr.s(auto_attribs=True)
class TopdownConfmapsPipeline(_BasePipelineBuilder):
    head_name: str = "centered_instance"


@attr.s(auto_attribs=True)
class BottomUpPipeline(_BasePipelineBuilder):
    head_name: str = "multi_instance"


@attr.s(auto_attribs=True)
class BottomUpMultiClassPipeline(_BasePipelineBuilder):
    head_name: str = "multi_class_bottomup"


@attr.s(auto_attribs=True)
class TopDownMultiClassPipeline(_BasePipelineBuilder):
    head_name: str = "multi_class_topdown"
