"""Task-specific data pipeline builders.

Rebuild of ``/root/reference/sleap/nn/data/pipelines.py`` (six builders at
:334-1262 composing ~30 tf.data transformer blocks). The TPU-native
architecture collapses those block chains: providers stay on the host
(decode + batch assembly + threaded prefetch) and every per-example
transform (normalize, augment, resize, crop, GT codec generation) runs as
ONE jitted function (the trainers' ``build_gt_fn`` chains).

The builders here expose the reference's API surface — same class names,
same ``data_config`` / ``optimization_config`` / ``<head>_config``
attributes, same ``make_base_pipeline`` / ``make_training_pipeline`` /
``make_viz_pipeline`` methods — and genuinely build:

- ``make_base_pipeline``: host batches (image + instance points), batched
  with validity counts and threaded prefetch.
- ``make_training_pipeline``: batches *with ground-truth targets* (confmaps
  / PAFs / offsets / class maps) computed by the jitted on-chip codec chain,
  augmented per the optimization config — what the reference's training
  pipelines emit, minus the tf.data plumbing.
- ``make_viz_pipeline``: unbatched examples for visualization.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional, Tuple

import attr
import jax
import numpy as np

from sleap_tpu.core.labels import Labels
from sleap_tpu.data.prefetch import prefetch
from sleap_tpu.data.providers import LabelsReader, VideoReader, batch_examples


@attr.s(auto_attribs=True)
class Pipeline:
    """A provider + host batching + (on-chip) transform chain.

    Iterates ``(example dict, n_valid)``. When ``gt_fn`` is set (training
    pipelines), each batch dict also contains the float input images under
    ``"image"`` and one key per supervised head output with its GT maps.
    """

    provider: Any
    batch_size: int = 4
    prefetch_buffer: int = 2
    gt_fn: Optional[Any] = None  # jitted (batch, rng) -> (imgs, gt dict)
    example_maker: Optional[Any] = None  # lf-batch -> batch dict (trainer.make_batch)
    examples: Optional[list] = None  # preloaded training examples
    shuffle: bool = False
    seed: int = 0

    def make_dataset(self) -> Iterator[Tuple[dict, int]]:
        """Iterate (batch, n_valid) with threaded prefetch."""
        if self.gt_fn is None:
            return prefetch(
                batch_examples(self.provider, self.batch_size),
                buffer_size=self.prefetch_buffer,
            )
        return self._training_iter()

    def _training_iter(self) -> Iterator[Tuple[dict, int]]:
        rng = np.random.default_rng(self.seed)
        jrng = jax.random.PRNGKey(self.seed)
        n = len(self.examples)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            n_valid = len(idx)
            # Pad the final batch to static shape by repeating examples.
            idx = np.concatenate([idx, idx[: self.batch_size - n_valid]])
            while len(idx) < self.batch_size:
                idx = np.concatenate([idx, idx])[: self.batch_size]
            batch = self.example_maker([self.examples[i] for i in idx], rng)
            jrng, step_rng = jax.random.split(jrng)
            imgs, gt = self.gt_fn(
                {k: jax.numpy.asarray(v) for k, v in batch.items()}, step_rng
            )
            out = {"image": np.asarray(imgs), "instances": batch["instances"]}
            out.update({k: np.asarray(v) for k, v in gt.items()})
            yield out, n_valid

    __iter__ = make_dataset


def _labels_of(provider) -> Labels:
    if isinstance(provider, Labels):
        return provider
    if isinstance(provider, LabelsReader):
        return provider.labels
    raise ValueError(
        "Training pipelines need labeled data (Labels or LabelsReader); "
        f"got {type(provider).__name__}."
    )


@attr.s(auto_attribs=True)
class _BasePipelineBuilder:
    """Shared builder surface (reference pipelines.py:334).

    Subclasses set ``head_name`` and carry the head config under the
    reference's attribute name.
    """

    data_config: Any = None
    optimization_config: Any = None
    head_name: str = ""

    def _head_configs(self) -> Dict[str, Any]:
        """Head configs this builder was given, keyed by oneof field name."""
        raise NotImplementedError

    def _make_trainer(self, labels: Labels):
        """Assemble a TrainingJobConfig and a trainer holding the jitted
        on-chip transform chain for this task."""
        from sleap_tpu import config as cfg
        from sleap_tpu.training.trainer import Trainer

        job = cfg.TrainingJobConfig()
        if self.data_config is not None:
            job.data = self.data_config
        if self.optimization_config is not None:
            job.optimization = self.optimization_config
        for field, value in self._head_configs().items():
            setattr(job.model.heads, field, value)
        # A tiny backbone: the pipeline never runs the model, but trainer
        # construction requires a backbone config.
        if job.model.backbone.which_oneof is None:
            job.model.backbone.unet = cfg.UNetConfig(
                max_stride=2, output_stride=2, filters=1
            )
        job.outputs.save_outputs = False
        trainer = Trainer.from_config(
            job, training_labels=labels, validation_labels=labels
        )
        # Data-only setup (no flax module init — the pipeline does not
        # forward through the model).
        trainer._max_instances = max(
            (
                len(lf.training_instances)
                for lf in trainer.data_readers.training_labels.labeled_frames
            ),
            default=1,
        ) or 1
        trainer._input_channels = trainer._image_channels()
        return trainer

    def make_base_pipeline(self, data_provider) -> Pipeline:
        batch = getattr(self.optimization_config, "batch_size", 4)
        return Pipeline(provider=data_provider, batch_size=batch)

    def make_training_pipeline(self, data_provider) -> Pipeline:
        from sleap_tpu.training.trainer import preload_examples

        labels = _labels_of(data_provider)
        trainer = self._make_trainer(labels)
        examples = preload_examples(
            trainer.data_readers.training_labels, trainer._max_instances
        )
        if hasattr(trainer, "expand_examples"):
            # Crop trainers index per (frame, instance) pair.
            examples = trainer.expand_examples(examples)
        batch = getattr(self.optimization_config, "batch_size", 4) or 4
        return Pipeline(
            provider=data_provider,
            batch_size=batch,
            gt_fn=jax.jit(trainer.build_gt_fn()),
            example_maker=trainer.make_batch,
            examples=examples,
            shuffle=True,
        )

    def make_viz_pipeline(self, data_provider) -> Pipeline:
        return Pipeline(provider=data_provider, batch_size=1)

    @property
    def trainer_cls(self):
        from sleap_tpu.training import trainer as T

        return {
            "single_instance": T.SingleInstanceTrainer,
            "centroid": T.CentroidTrainer,
            "centered_instance": T.TopdownConfmapsTrainer,
            "multi_instance": T.BottomUpTrainer,
            "multi_class_bottomup": T.BottomUpMultiClassTrainer,
            "multi_class_topdown": T.TopDownMultiClassTrainer,
        }[self.head_name]


@attr.s(auto_attribs=True)
class SingleInstanceConfmapsPipeline(_BasePipelineBuilder):
    """Reference pipelines.py:334."""

    single_instance_confmap_head: Any = None
    head_name: str = "single_instance"

    def _head_configs(self):
        from sleap_tpu import config as cfg

        return {
            "single_instance": self.single_instance_confmap_head
            or cfg.SingleInstanceConfmapsHeadConfig()
        }


@attr.s(auto_attribs=True)
class CentroidConfmapsPipeline(_BasePipelineBuilder):
    """Reference pipelines.py:522."""

    centroid_confmap_head: Any = None
    head_name: str = "centroid"

    def _head_configs(self):
        from sleap_tpu import config as cfg

        return {"centroid": self.centroid_confmap_head or cfg.CentroidsHeadConfig()}


@attr.s(auto_attribs=True)
class TopdownConfmapsPipeline(_BasePipelineBuilder):
    """Reference pipelines.py:655."""

    instance_confmap_head: Any = None
    head_name: str = "centered_instance"

    def _head_configs(self):
        from sleap_tpu import config as cfg

        return {
            "centered_instance": self.instance_confmap_head
            or cfg.CenteredInstanceConfmapsHeadConfig()
        }


@attr.s(auto_attribs=True)
class BottomUpPipeline(_BasePipelineBuilder):
    """Reference pipelines.py:824."""

    confmaps_head: Any = None
    pafs_head: Any = None
    head_name: str = "multi_instance"

    def _head_configs(self):
        from sleap_tpu import config as cfg

        mi = cfg.MultiInstanceConfig(
            confmaps=self.confmaps_head or cfg.MultiInstanceConfmapsHeadConfig(),
            pafs=self.pafs_head or cfg.PartAffinityFieldsHeadConfig(),
        )
        return {"multi_instance": mi}


@attr.s(auto_attribs=True)
class BottomUpMultiClassPipeline(_BasePipelineBuilder):
    """Reference pipelines.py:986."""

    confmaps_head: Any = None
    class_maps_head: Any = None
    head_name: str = "multi_class_bottomup"

    def _head_configs(self):
        from sleap_tpu import config as cfg

        mc = cfg.MultiClassBottomUpConfig(
            confmaps=self.confmaps_head or cfg.MultiInstanceConfmapsHeadConfig(),
            class_maps=self.class_maps_head or cfg.ClassMapsHeadConfig(),
        )
        return {"multi_class_bottomup": mc}


@attr.s(auto_attribs=True)
class TopDownMultiClassPipeline(_BasePipelineBuilder):
    """Reference pipelines.py:1117."""

    instance_confmap_head: Any = None
    class_vectors_head: Any = None
    head_name: str = "multi_class_topdown"

    def _head_configs(self):
        from sleap_tpu import config as cfg

        mc = cfg.MultiClassTopDownConfig(
            confmaps=self.instance_confmap_head
            or cfg.CenteredInstanceConfmapsHeadConfig(),
            class_vectors=self.class_vectors_head or cfg.ClassVectorsHeadConfig(),
        )
        return {"multi_class_topdown": mc}
