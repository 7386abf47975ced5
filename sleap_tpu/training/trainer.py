"""Training: config -> jitted optax train loop -> reference-layout run folder.

Rebuild of ``/root/reference/sleap/nn/training.py`` (``Trainer:560`` and its
six per-head subclasses, ``DataReaders:86``, run-folder outputs at :363-499).
TPU-native design:

- One jitted ``train_step`` contains everything after host batch assembly:
  uint8 -> float, on-chip augmentation, ground-truth codec generation
  (confmaps / PAFs / offsets / class maps), forward, loss, and the optax
  update. GT maps are never materialized on the host.
- Examples are preloaded and cached as raw uint8 frames + NaN-padded point
  arrays; batches have static shapes.
- LR plateau reduction / early stopping / best-checkpoint logic mirror the
  reference Keras callbacks (training.py:323-462) as small host classes.
- Run folders keep the reference layout: ``training_config.json``,
  ``initial_config.json``, ``best_model.ckpt`` (orbax, instead of .h5),
  ``training_log.csv``, ``labels_gt/pr.*.slp``, ``metrics.*.npz``.
"""

from __future__ import annotations

import csv
import logging
import os
import time
from datetime import datetime
from typing import Any, Callable, Dict, List, Optional, Tuple

import attr
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sleap_tpu.config import TrainingJobConfig
from sleap_tpu.core.labels import Labels
from sleap_tpu.data.augmentation import augment_example
from sleap_tpu.data.instance_centroids import get_instance_centroids
from sleap_tpu.data.normalization import ensure_float, ensure_grayscale, ensure_rgb
from sleap_tpu.data.resizing import pad_to_stride, resize_image
from sleap_tpu.models.model import Model
from sleap_tpu.ops.confmaps import (
    make_confmaps,
    make_multi_confmaps,
    make_multi_confmaps_with_offsets,
)
from sleap_tpu.ops.edge_maps import get_edge_points, make_multi_pafs
from sleap_tpu.ops.grid import make_grid_vectors
from sleap_tpu.ops.offsets import make_offsets, mask_offsets
from sleap_tpu.ops.peak_finding import crop_and_resize, make_centered_bboxes
from sleap_tpu.training.losses import categorical_crossentropy, compute_ohkm_loss, mse_loss

logger = logging.getLogger(__name__)


# --------------------------------------------------------------------------- #
# Data splitting / preloading
# --------------------------------------------------------------------------- #


@attr.s(auto_attribs=True)
class DataReaders:
    """Train/val/test labels (reference training.py:86)."""

    training_labels: Labels
    validation_labels: Labels
    test_labels: Optional[Labels] = None

    @classmethod
    def from_config(
        cls,
        labels_config,
        training: Any = None,
        validation: Any = None,
        test: Any = None,
    ) -> "DataReaders":
        def load(x):
            if x is None:
                return None
            if isinstance(x, Labels):
                return x
            return Labels.load_file(x)

        training = load(training or labels_config.training_labels)
        validation = load(validation or labels_config.validation_labels)
        test = load(test or labels_config.test_labels)
        if training is None:
            raise ValueError("Training labels must be provided.")
        training = training.with_user_labels_only(copy=False)
        if validation is None:
            if labels_config.split_by_inds and labels_config.validation_inds:
                validation = training.extract(labels_config.validation_inds)
                training = training.extract(labels_config.training_inds)
            else:
                training, validation = training.split(
                    1.0 - labels_config.validation_fraction
                )
        else:
            validation = validation.with_user_labels_only(copy=False)
        return cls(training_labels=training, validation_labels=validation, test_labels=test)


def size_match_image(
    img: np.ndarray, target_hw: Tuple[int, int]
) -> Tuple[np.ndarray, float]:
    """Host-side SizeMatcher transform (reference data/resizing.py:257):
    scale to fit inside (th, tw), pad bottom/right. Points map as
    ``pts * scale``. Returns (matched image, scale)."""
    th, tw = target_hw
    h, w = img.shape[0], img.shape[1]
    if (h, w) == (th, tw):
        return img, 1.0
    scale = min(th / h, tw / w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    if (new_h, new_w) != (h, w):
        import cv2

        resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        if resized.ndim == 2:
            resized = resized[..., None]
    else:
        resized = img
    out = np.zeros((th, tw) + img.shape[2:], img.dtype)
    out[:new_h, :new_w] = resized
    return out, scale


def build_example(
    lf,
    labels: Labels,
    max_instances: int,
    target_hw: Optional[Tuple[int, int]] = None,
    class_names: Optional[List[str]] = None,
) -> Optional[Dict[str, np.ndarray]]:
    """Decode one labeled frame into a training example dict (or None).

    ``track_inds`` index into ``class_names`` when given (the model head's
    class list — the order the class-maps/-vectors channels are trained
    against), else into ``labels.tracks``. Mapping by NAME matters: a split's
    ``labels.tracks`` order need not match the config's class order
    (reference identity.py keys class channels off the configured class
    list).
    """
    insts = lf.training_instances
    if not insts:
        return None
    try:
        img = lf.image
    except Exception:
        return None
    scale = 1.0
    if target_hw is not None:
        img, scale = size_match_image(np.asarray(img), target_hw)
    pts = np.full((max_instances, insts[0].skeleton.n_nodes, 2), np.nan, "f4")
    tracks = np.full(max_instances, -1, "i4")
    for i, inst in enumerate(insts[:max_instances]):
        pts[i] = inst.numpy() * scale
        if inst.track is None:
            continue
        if class_names is not None:
            if inst.track.name in class_names:
                tracks[i] = class_names.index(inst.track.name)
        elif inst.track in labels.tracks:
            tracks[i] = labels.tracks.index(inst.track)
    return {"image": img, "instances": pts, "track_inds": tracks}


def preload_examples(
    labels: Labels,
    max_instances: int,
    target_hw: Optional[Tuple[int, int]] = None,
    class_names: Optional[List[str]] = None,
) -> List[Dict[str, np.ndarray]]:
    """Decode all labeled frames into memory (reference Preloader)."""
    examples = []
    for lf in labels.labeled_frames:
        ex = build_example(lf, labels, max_instances, target_hw, class_names)
        if ex is not None:
            examples.append(ex)
    return examples


class LazyExamples:
    """Streaming alternative to preloading (reference preload_data=False):
    frames are decoded on access instead of held in RAM — the right mode for
    projects too large to preload (the reference's ``Preloader`` is optional
    for the same reason)."""

    def __init__(
        self,
        labels: Labels,
        max_instances: int,
        target_hw: Optional[Tuple[int, int]] = None,
        class_names: Optional[List[str]] = None,
    ):
        self.labels = labels
        self.max_instances = max_instances
        self.target_hw = target_hw
        self.class_names = class_names
        self._lfs = [lf for lf in labels.labeled_frames if lf.training_instances]

    def __len__(self) -> int:
        return len(self._lfs)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        ex = build_example(
            self._lfs[i],
            self.labels,
            self.max_instances,
            self.target_hw,
            self.class_names,
        )
        if ex is None:
            raise RuntimeError(
                f"Failed to decode frame {self._lfs[i].frame_idx} while streaming."
            )
        return ex

    def expand_instances(self) -> "LazyInstanceExamples":
        """Per-instance flat view (crop trainers) without decoding frames."""
        return LazyInstanceExamples(self)


class LazyInstanceExamples:
    """Flat (frame, instance) indexing over :class:`LazyExamples`."""

    def __init__(self, base: LazyExamples):
        self.base = base
        self._index = [
            (fi, ci)
            for fi, lf in enumerate(base._lfs)
            for ci in range(min(len(lf.training_instances), base.max_instances))
        ]

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        fi, ci = self._index[i]
        return {**self.base[fi], "ctr_ind": ci}


def find_instance_crop_size(
    labels: Labels,
    padding: int = 0,
    maximum_stride: int = 2,
    input_scaling: float = 1.0,
    min_crop_size: Optional[int] = None,
) -> int:
    """Dataset-wide crop size (reference instance_cropping.py:11)."""
    min_crop_size = 0 if min_crop_size is None else min_crop_size
    if min_crop_size > 0 and min_crop_size % maximum_stride == 0:
        return min_crop_size
    max_length = 0.0
    for inst in labels.user_instances:
        pts = inst.numpy() * input_scaling
        with np.errstate(all="ignore"):
            max_length = max(
                max_length,
                np.nanmax(pts[:, 0]) - np.nanmin(pts[:, 0]),
                np.nanmax(pts[:, 1]) - np.nanmin(pts[:, 1]),
                min_crop_size - padding,
            )
    max_length += float(padding)
    return int(np.ceil(max_length / maximum_stride) * maximum_stride)


# --------------------------------------------------------------------------- #
# Host-side schedule callbacks
# --------------------------------------------------------------------------- #


class ReduceLROnPlateau:
    """Reference LearningRateScheduleConfig semantics (Keras callback)."""

    def __init__(self, cfg, initial_lr: float):
        self.cfg = cfg
        self.lr = initial_lr
        self.best = np.inf
        self.wait = 0
        self.cooldown = 0

    def update(self, val_loss: float) -> float:
        if not self.cfg.reduce_on_plateau:
            return self.lr
        if self.cooldown > 0:
            self.cooldown -= 1
            self.best = min(self.best, val_loss)
            return self.lr
        if val_loss < self.best - self.cfg.plateau_min_delta:
            self.best = val_loss
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.cfg.plateau_patience:
                self.lr = max(
                    self.lr * self.cfg.reduction_factor, self.cfg.min_learning_rate
                )
                self.wait = 0
                self.cooldown = self.cfg.plateau_cooldown
                logger.info("Reducing learning rate to %g", self.lr)
        return self.lr


class EarlyStopping:
    def __init__(self, cfg):
        self.cfg = cfg
        self.best = np.inf
        self.wait = 0

    def should_stop(self, val_loss: float) -> bool:
        if not self.cfg.stop_training_on_plateau:
            return False
        if val_loss < self.best - self.cfg.plateau_min_delta:
            self.best = val_loss
            self.wait = 0
            return False
        self.wait += 1
        return self.wait >= self.cfg.plateau_patience


# --------------------------------------------------------------------------- #
# Trainer
# --------------------------------------------------------------------------- #


@attr.s(auto_attribs=True)
class Trainer:
    """Base trainer; concrete GT assembly is chosen by head type."""

    config: TrainingJobConfig
    data_readers: DataReaders
    model: Model
    # Data-parallel training: shard batches over an n-device mesh (params
    # replicated, gradient all-reduce inserted by XLA). None/1 = single-device.
    n_devices: Optional[int] = None
    # Spatial (H-axis) sharding factor for very large frames: the mesh
    # becomes (data: n/spatial, spatial); image-like batch leaves shard
    # their height axis and XLA inserts conv halo exchanges. 1 = off.
    spatial_sharding: int = 1

    # Filled by setup():
    module: Any = None
    variables: Any = None
    run_path: Optional[str] = None
    _train_examples: List = attr.ib(factory=list)
    _val_examples: List = attr.ib(factory=list)
    _max_instances: int = 1
    _input_channels: int = 1
    _zmq_reporter: Any = None
    _zmq_controller: Any = None

    @classmethod
    def from_config(
        cls,
        config: TrainingJobConfig,
        training_labels: Any = None,
        validation_labels: Any = None,
        test_labels: Any = None,
        n_devices: Optional[int] = None,
        spatial_sharding: int = 1,
    ) -> "Trainer":
        head_name = config.model.heads.which_oneof_attrib_name
        trainer_cls = {
            "single_instance": SingleInstanceTrainer,
            "centroid": CentroidTrainer,
            "centered_instance": TopdownConfmapsTrainer,
            "multi_instance": BottomUpTrainer,
            "multi_class_bottomup": BottomUpMultiClassTrainer,
            "multi_class_topdown": TopDownMultiClassTrainer,
        }.get(head_name)
        if trainer_cls is None:
            raise ValueError(f"No trainer for head type {head_name!r}.")
        data_readers = DataReaders.from_config(
            config.data.labels,
            training=training_labels,
            validation=validation_labels,
            test=test_labels,
        )
        skeleton = (
            config.data.labels.skeletons[0]
            if config.data.labels.skeletons
            else data_readers.training_labels.skeleton
        )
        if not config.data.labels.skeletons:
            config.data.labels.skeletons = [skeleton]
        tracks = data_readers.training_labels.tracks or None
        model = Model.from_config(
            config.model, skeleton=skeleton, tracks=tracks, update_config=True
        )
        return trainer_cls(
            config=config, data_readers=data_readers, model=model,
            n_devices=n_devices, spatial_sharding=spatial_sharding,
        )

    # ------------------------------------------------------------------ #
    @property
    def skeleton(self):
        return self.config.data.labels.skeletons[0]

    @property
    def head_config(self):
        return self.config.model.heads.which_oneof

    def _head_class_names(self) -> Optional[List[str]]:
        """Class list of the identity head, if any — the channel order that
        ``track_inds`` must index (reference identity.py class maps/vectors
        are keyed off the configured class list, not labels.tracks order)."""
        for head in self.model.heads:
            names = getattr(head, "classes", None)
            if names:
                return list(names)
        return None

    @property
    def keras_model(self):
        return self.module  # API-compat alias

    def _update_config(self) -> None:
        """Fill derived config fields (reference training.py:747-800)."""
        pass

    def _image_channels(self) -> int:
        pp = self.config.data.preprocessing
        if pp.ensure_grayscale:
            return 1
        if pp.ensure_rgb:
            return 3
        video = self.data_readers.training_labels.video
        return int(video.channels) if video is not None else 1

    def setup(self) -> None:
        self._update_config()
        self._max_instances = max(
            (
                len(lf.training_instances)
                for lf in self.data_readers.training_labels.labeled_frames
            ),
            default=1,
        ) or 1
        self._input_channels = self._image_channels()
        # Mixed-size projects: size-match every frame to the largest video
        # (reference SizeMatcher in training pipelines, data/resizing.py:257).
        sizes = {
            (int(v.height), int(v.width))
            for labels in (
                self.data_readers.training_labels,
                self.data_readers.validation_labels,
            )
            for v in labels.videos
            if v.height and v.width
        }
        target_hw = (
            (max(h for h, _ in sizes), max(w for _, w in sizes))
            if len(sizes) > 1
            else None
        )
        maker = (
            preload_examples
            if self.config.optimization.preload_data
            else LazyExamples
        )
        class_names = self._head_class_names()
        self._train_examples = maker(
            self.data_readers.training_labels,
            self._max_instances,
            target_hw,
            class_names,
        )
        self._val_examples = maker(
            self.data_readers.validation_labels,
            self._max_instances,
            target_hw,
            class_names,
        )
        if not len(self._train_examples):
            raise ValueError("No trainable examples found.")
        max_stride = self.model.maximum_stride
        init_hw = max(4 * max_stride, 32)
        compute_dtype = (
            jnp.bfloat16
            if self.config.optimization.mixed_precision
            else jnp.float32
        )
        self.module, self.variables = self.model.init(
            jax.random.PRNGKey(0),
            (init_hw, init_hw, self._input_channels),
            compute_dtype=compute_dtype,
        )
        if self.config.model.base_checkpoint:
            from sleap_tpu.inference.predictors import load_trained_model

            base = load_trained_model(self.config.model.base_checkpoint)
            self.variables = base.variables
        self._setup_run_folder()
        self._setup_zmq()

    def _setup_run_folder(self) -> None:
        out = self.config.outputs
        if not out.save_outputs:
            self.run_path = None
            return
        if out.run_name is None:
            out.run_name = datetime.now().strftime("%y%m%d_%H%M%S") + ".{}".format(
                type(self).__name__.replace("Trainer", "").lower() or "model"
            )
        self.run_path = out.run_path
        os.makedirs(self.run_path, exist_ok=True)
        self.config.save_json(os.path.join(self.run_path, "initial_config.json"))
        # Written up front too (reference training.py:866) so a crashed or
        # in-progress run folder is loadable for resume-from-latest.
        self.config.save_json(os.path.join(self.run_path, "training_config.json"))

    def _setup_tensorboard(self):
        tb = self.config.outputs.tensorboard
        if not (tb.write_logs and self.run_path):
            return None
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(log_dir=self.run_path)
        except ImportError:
            logger.warning("TensorBoard logging requested but unavailable.")
            return None

    def _save_visualization(self, epoch: int, batch, gt_fn, params, batch_stats) -> None:
        """Save a confmap-overlay PNG for one validation example
        (reference MatplotlibSaver, callbacks.py:243)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            import jax.numpy as jnp

            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            imgs, gt = gt_fn(
                {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(0)
            )
            preds = self.module.apply(variables, imgs, train=False)
            key = next(k for k in preds if "Confmaps" in k and "_stack" not in k)
            img = np.asarray(imgs[0])
            cms = np.asarray(preds[key][0], dtype="f4")
            fig, axes = plt.subplots(1, 2, figsize=(8, 4))
            axes[0].imshow(img.squeeze(), cmap="gray")
            axes[0].set_title("input")
            axes[1].imshow(cms.max(axis=-1))
            axes[1].set_title(f"predicted {key}")
            for ax in axes:
                ax.set_axis_off()
            viz_dir = os.path.join(self.run_path, "viz")
            os.makedirs(viz_dir, exist_ok=True)
            fig.savefig(os.path.join(viz_dir, f"epoch_{epoch:03d}.png"), dpi=72)
            plt.close(fig)
        except Exception as e:  # viz must never break training
            logger.debug("Visualization failed: %s", e)

    def _setup_zmq(self) -> None:
        zmq_cfg = self.config.outputs.zmq
        if zmq_cfg.publish_updates:
            from sleap_tpu.training.callbacks import ProgressReporterZMQ

            self._zmq_reporter = ProgressReporterZMQ(zmq_cfg.publish_address)
        if zmq_cfg.subscribe_to_controller:
            from sleap_tpu.training.callbacks import TrainingControllerZMQ

            self._zmq_controller = TrainingControllerZMQ(
                zmq_cfg.controller_address, zmq_cfg.controller_polling_timeout
            )

    # ------------------------------------------------------------------ #
    # To be provided by subclasses:
    # ------------------------------------------------------------------ #
    def make_batch(self, examples: List[Dict], rng: np.random.Generator) -> Dict:
        """Assemble a host batch dict from cached examples."""
        raise NotImplementedError

    def build_gt_fn(self) -> Callable:
        """Return a traceable fn(batch, rng) -> (imgs_float, gt dict)."""
        raise NotImplementedError

    # ------------------------------------------------------------------ #
    def _loss_terms(self):
        """(output key, weight, loss kind) per supervised head output."""
        terms = []
        for head in self.model.heads:
            kind = (
                "xent" if head.loss_function == "categorical_crossentropy" else "mse"
            )
            terms.append((head.name, head.loss_weight, kind))
        return terms

    def _build_train_step(self, optimizer):
        gt_fn = self.build_gt_fn()
        loss_terms = self._loss_terms()
        module = self.module
        has_bn = "batch_stats" in self.variables
        ohkm_cfg = self.config.optimization.hard_keypoint_mining
        stacks = getattr(self.model.backbone, "stacks", 1)

        def compute_loss(params, batch_stats, batch, rng, train: bool):
            imgs, gt = gt_fn(batch, rng)
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
            if train and has_bn:
                preds, updates = module.apply(
                    variables, imgs, train=True, mutable=["batch_stats"]
                )
                new_bs = updates["batch_stats"]
            else:
                preds = module.apply(variables, imgs, train=False)
                new_bs = batch_stats
            loss = 0.0
            for name, weight, kind in loss_terms:
                target = gt[name]
                keys = [name] + [f"{name}_stack{i}" for i in range(stacks - 1)]
                for key in keys:
                    if key not in preds:
                        continue
                    # Under mixed precision the head outputs are bfloat16;
                    # accumulate every loss term in float32.
                    pred = preds[key].astype(jnp.float32)
                    if kind == "xent":
                        term = categorical_crossentropy(target, pred)
                    else:
                        term = mse_loss(target, pred)
                        if ohkm_cfg.online_mining and kind == "mse":
                            term = term + compute_ohkm_loss(
                                target,
                                pred,
                                hard_to_easy_ratio=ohkm_cfg.hard_to_easy_ratio,
                                min_hard_keypoints=ohkm_cfg.min_hard_keypoints,
                                max_hard_keypoints=ohkm_cfg.max_hard_keypoints,
                                loss_scale=ohkm_cfg.loss_scale,
                            )
                    loss = loss + weight * term
            return loss, new_bs

        @jax.jit
        def train_step(params, batch_stats, opt_state, batch, rng):
            (loss, new_bs), grads = jax.value_and_grad(
                lambda p: compute_loss(p, batch_stats, batch, rng, True), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss

        @jax.jit
        def val_step(params, batch_stats, batch, rng):
            loss, _ = compute_loss(params, batch_stats, batch, rng, False)
            return loss

        return train_step, val_step

    def train(self) -> None:
        """Run the full optimization loop (reference training.py:921)."""
        if self.module is None:
            self.setup()
        opt_cfg = self.config.optimization
        opt_fn = optax.amsgrad if opt_cfg.optimizer == "amsgrad" else optax.adam
        optimizer = optax.inject_hyperparams(opt_fn)(
            learning_rate=opt_cfg.initial_learning_rate
        )
        params = self.variables["params"]
        batch_stats = self.variables.get("batch_stats", {})
        opt_state = optimizer.init(params)
        train_step, val_step = self._build_train_step(optimizer)

        batch_size = opt_cfg.batch_size
        if self.n_devices and self.n_devices > 1:
            from sleap_tpu.parallel.distributed import (
                sharded_train_step,
                sharded_val_step,
            )
            from sleap_tpu.parallel.mesh import make_mesh

            spatial = max(int(self.spatial_sharding or 1), 1)
            mesh = make_mesh(n_devices=self.n_devices, spatial=spatial)
            n_data = mesh.shape["data"]
            # Round up so every batch leaf's leading axis shards evenly.
            batch_size = -(-batch_size // n_data) * n_data
            train_step = sharded_train_step(train_step, mesh, spatial=spatial > 1)
            val_step = sharded_val_step(val_step, mesh, spatial=spatial > 1)
            logger.info(
                "Data-parallel training over %d devices (batch_size=%d, "
                "spatial=%d).",
                self.n_devices, batch_size, spatial,
            )
        n_train = len(self._train_examples)
        batches_per_epoch = opt_cfg.batches_per_epoch or max(
            opt_cfg.min_batches_per_epoch, -(-n_train // batch_size)
        )
        val_batches = opt_cfg.val_batches_per_epoch or max(
            opt_cfg.min_val_batches_per_epoch,
            -(-len(self._val_examples) // batch_size),
        )

        lr_sched = ReduceLROnPlateau(
            opt_cfg.learning_rate_schedule, opt_cfg.initial_learning_rate
        )
        stopper = EarlyStopping(opt_cfg.early_stopping)
        rng = np.random.default_rng(0)
        jrng = jax.random.PRNGKey(42)

        tb_writer = self._setup_tensorboard()
        save_viz = (
            self.config.outputs.save_visualizations
            and self.config.outputs.save_outputs
            and self.run_path
        )
        viz_gt_fn = self.build_gt_fn() if save_viz else None
        log_rows = []
        best_val = np.inf
        t_train = time.time()
        stop_requested = False
        ckpt_cfg = self.config.outputs.checkpointing

        def current_variables():
            return (
                {"params": params, "batch_stats": batch_stats}
                if batch_stats
                else {"params": params}
            )

        # train_begin event (reference ModelCheckpointOnEvent, training.py:421).
        if ckpt_cfg.initial_model:
            self._save_checkpoint("initial_model.ckpt", current_variables())
        # Profiling (reference TensorBoardConfig.profile_graph): trace the
        # first epoch with the JAX profiler (XLA device + host timelines,
        # viewable in TensorBoard / Perfetto).
        profile_dir = None
        if self.config.outputs.tensorboard.profile_graph and self.run_path:
            profile_dir = os.path.join(self.run_path, "profile")
            jax.profiler.start_trace(profile_dir)
        for epoch in range(opt_cfg.epochs):
            if self._zmq_reporter:
                self._zmq_reporter.epoch_begin(epoch)
            t0 = time.time()
            train_losses = []
            for b in range(batches_per_epoch):
                batch = self.make_batch(
                    [self._train_examples[i] for i in rng.integers(0, n_train, batch_size)],
                    rng,
                )
                jrng, step_rng = jax.random.split(jrng)
                params, batch_stats, opt_state, loss = train_step(
                    params, batch_stats, opt_state,
                    {k: jnp.asarray(v) for k, v in batch.items()}, step_rng,
                )
                # Defer the device->host loss fetch to epoch end so jit
                # dispatch pipelines the whole epoch (a per-step float() sync
                # costs ~1 ms+ on remote-device runtimes). ZMQ progress
                # reporting needs the value per batch, so it keeps the eager
                # fetch.
                if self._zmq_reporter:
                    train_losses.append(float(loss))
                    self._zmq_reporter.batch_end(epoch, b, train_losses[-1])
                else:
                    train_losses.append(loss)
                if self._zmq_controller:
                    if self._zmq_controller.poll() == "stop":
                        stop_requested = True
                        break
                    new_lr = self._zmq_controller.take_requested_lr()
                    if new_lr is not None:
                        lr_sched.lr = new_lr
                        opt_state.hyperparams["learning_rate"] = jnp.asarray(new_lr)

            val_losses = []
            # No usable validation examples (all frames dropped at preload):
            # skip validation; val_loss falls back to train_loss below.
            for b in range(val_batches if self._val_examples else 0):
                idx = rng.integers(0, max(len(self._val_examples), 1), batch_size)
                batch = self.make_batch(
                    [self._val_examples[i % len(self._val_examples)] for i in idx], rng
                )
                jrng, step_rng = jax.random.split(jrng)
                val_losses.append(
                    val_step(
                        params, batch_stats,
                        {k: jnp.asarray(v) for k, v in batch.items()}, step_rng,
                    )
                )

            train_losses = [float(l) for l in train_losses]
            val_losses = [float(l) for l in val_losses]
            train_loss = float(np.mean(train_losses)) if train_losses else np.nan
            val_loss = float(np.mean(val_losses)) if val_losses else train_loss
            lr = lr_sched.update(val_loss)
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
            log_rows.append(
                {"epoch": epoch, "loss": train_loss, "val_loss": val_loss, "lr": lr}
            )
            if tb_writer is not None:
                tb_writer.add_scalar("loss", train_loss, epoch)
                tb_writer.add_scalar("val_loss", val_loss, epoch)
                tb_writer.add_scalar("lr", lr, epoch)
            if save_viz:
                viz_batch = self.make_batch(
                    [self._val_examples[0]] * batch_size, rng
                )
                self._save_visualization(epoch, viz_batch, viz_gt_fn, params, batch_stats)
            logger.info(
                "Epoch %d/%d - loss: %.6f - val_loss: %.6f (%.1fs)",
                epoch + 1, opt_cfg.epochs, train_loss, val_loss, time.time() - t0,
            )
            if profile_dir is not None and epoch == 0:
                jax.profiler.stop_trace()
                logger.info("Saved first-epoch profiler trace to %s", profile_dir)
                profile_dir = None
            if self._zmq_reporter:
                self._zmq_reporter.epoch_end(epoch, train_loss, val_loss)

            if val_loss < best_val and ckpt_cfg.best_model:
                best_val = val_loss
                self.variables = current_variables()
                self._save_checkpoint("best_model.ckpt")
            # epoch_end events (reference training.py:438-451).
            if ckpt_cfg.every_epoch:
                self._save_checkpoint(f"model.epoch{epoch:04d}.ckpt", current_variables())
            if ckpt_cfg.latest_model:
                self._save_checkpoint("latest_model.ckpt", current_variables())
            if stop_requested or stopper.should_stop(val_loss):
                logger.info("Early stopping at epoch %d.", epoch + 1)
                break

        # train_end event (reference training.py:453-458).
        if ckpt_cfg.final_model:
            self._save_checkpoint("final_model.ckpt", current_variables())
        if not ckpt_cfg.best_model:
            self.variables = current_variables()
        logger.info("Finished training in %.1fs.", time.time() - t_train)
        if self.run_path:
            self.config.save_json(os.path.join(self.run_path, "training_config.json"))
            if self.config.outputs.log_to_csv and log_rows:
                with open(os.path.join(self.run_path, "training_log.csv"), "w", newline="") as f:
                    writer = csv.DictWriter(f, fieldnames=list(log_rows[0].keys()))
                    writer.writeheader()
                    writer.writerows(log_rows)
            self._save_gt_labels()
            self.evaluate()
        if tb_writer is not None:
            tb_writer.close()
        if (
            self.run_path
            and save_viz
            and not self.config.outputs.keep_viz_images
        ):
            import shutil

            shutil.rmtree(os.path.join(self.run_path, "viz"), ignore_errors=True)
        if self.run_path and self.config.outputs.zip_outputs:
            self.package()
        if self._zmq_reporter:
            self._zmq_reporter.close()

    def _save_checkpoint(self, name: str, variables: Any = None) -> None:
        if not self.run_path:
            return
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.run_path, name))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, variables if variables is not None else self.variables, force=True)
        ckptr.wait_until_finished()

    def package(self) -> None:
        """Zip the run folder for portability (reference training.py:996-1009)."""
        if not self.run_path:
            return
        import shutil

        logger.info("Packaging run folder: %s.zip", self.run_path)
        shutil.make_archive(self.run_path, "zip", self.run_path)

    def _save_gt_labels(self) -> None:
        try:
            self.data_readers.training_labels.save(
                os.path.join(self.run_path, "labels_gt.train.slp")
            )
            self.data_readers.validation_labels.save(
                os.path.join(self.run_path, "labels_gt.val.slp")
            )
        except Exception as e:
            logger.warning("Could not save GT labels: %s", e)

    def evaluate(self) -> None:
        """Post-training evaluation on train/val splits (training.py:958)."""
        from sleap_tpu.evals import evaluate_model

        for split, labels in (
            ("train", self.data_readers.training_labels),
            ("val", self.data_readers.validation_labels),
        ):
            try:
                evaluate_model(self.config, labels, self.run_path, split_name=split)
            except Exception as e:
                logger.warning("Evaluation on %s split failed: %s", split, e)

    # Shared on-chip preprocessing for GT fns.
    def _prep_images(self, images):
        pp = self.config.data.preprocessing
        grayscale = self._input_channels == 1
        imgs = ensure_grayscale(images) if grayscale else ensure_rgb(images)
        imgs = ensure_float(imgs)
        if pp.imagenet_mode:
            from sleap_tpu.data.normalization import apply_imagenet_mode

            imgs = apply_imagenet_mode(imgs, pp.imagenet_mode)
        return imgs

    def _resize_pad(self, imgs):
        pp = self.config.data.preprocessing
        if pp.input_scaling != 1.0:
            imgs = resize_image(imgs, pp.input_scaling)
        stride = pp.pad_to_stride or self.model.maximum_stride
        if stride > 1:
            imgs = pad_to_stride(imgs, stride)
        return imgs

    def _augment(self, imgs, instances, rng):
        aug_cfg = self.config.optimization.augmentation_config
        flip_idx = jnp.asarray(self.skeleton.flip_idx(), jnp.int32)
        keys = jax.random.split(rng, imgs.shape[0])
        return jax.vmap(
            lambda k, im, inst: augment_example(k, im, inst, aug_cfg, flip_idx)
        )(keys, imgs, instances)


# --------------------------------------------------------------------------- #
# Concrete trainers
# --------------------------------------------------------------------------- #


class _FullFrameBatchMixin:
    def make_batch(self, examples, rng):
        return {
            "image": np.stack([e["image"] for e in examples]),
            "instances": np.stack([e["instances"] for e in examples]),
            "track_inds": np.stack([e["track_inds"] for e in examples]),
        }


@attr.s(auto_attribs=True)
class SingleInstanceTrainer(_FullFrameBatchMixin, Trainer):
    """Full-frame confmaps of a single instance (training.py:1009)."""

    def build_gt_fn(self):
        head = self.config.model.heads.single_instance
        sigma = head.sigma
        stride = head.output_stride
        scale = self.config.data.preprocessing.input_scaling
        with_offsets = head.offset_refinement

        def gt_fn(batch, rng):
            imgs = self._prep_images(batch["image"])
            imgs, instances = self._augment(imgs, batch["instances"], rng)
            imgs = self._resize_pad(imgs)
            points = instances[:, 0] * scale  # (B, N, 2)
            H, W = imgs.shape[1], imgs.shape[2]
            xv, yv = make_grid_vectors(H, W, stride)
            cms = jax.vmap(lambda p: make_confmaps(p, xv, yv, sigma))(points)
            gt = {"SingleInstanceConfmapsHead": cms}
            if with_offsets:
                offs = jax.vmap(
                    lambda p, c: mask_offsets(make_offsets(p, xv, yv, stride), c)
                )(points, cms)
                gt["OffsetRefinementHead"] = offs.reshape(*offs.shape[:3], -1)
            return imgs, gt

        return gt_fn


@attr.s(auto_attribs=True)
class CentroidTrainer(_FullFrameBatchMixin, Trainer):
    """Anchor-part centroid confmaps over all instances (training.py:1126)."""

    def _anchor_ind(self):
        anchor = self.config.model.heads.centroid.anchor_part
        if anchor and anchor in self.skeleton.node_names:
            return self.skeleton.node_names.index(anchor)
        return None

    def build_gt_fn(self):
        head = self.config.model.heads.centroid
        sigma = head.sigma
        stride = head.output_stride
        scale = self.config.data.preprocessing.input_scaling
        with_offsets = head.offset_refinement
        anchor_ind = self._anchor_ind()

        def centroids_of(instances):
            # (I, N, 2) -> (I, 1, 2) anchor or bbox midpoint.
            mins = jnp.nanmin(instances, axis=1)
            maxs = jnp.nanmax(instances, axis=1)
            mids = (mins + maxs) / 2.0
            if anchor_ind is not None:
                anchors = instances[:, anchor_ind, :]
                missing = jnp.isnan(anchors).any(axis=-1)
                mids = jnp.where(missing[:, None], mids, anchors)
            return mids[:, None, :]

        def gt_fn(batch, rng):
            imgs = self._prep_images(batch["image"])
            imgs, instances = self._augment(imgs, batch["instances"], rng)
            imgs = self._resize_pad(imgs)
            anchors = jax.vmap(centroids_of)(instances * scale)  # (B, I, 1, 2)
            H, W = imgs.shape[1], imgs.shape[2]
            xv, yv = make_grid_vectors(H, W, stride)
            if with_offsets:
                cms, offs = jax.vmap(
                    lambda a: make_multi_confmaps_with_offsets(a, xv, yv, stride, sigma)
                )(anchors)
                return imgs, {
                    "CentroidConfmapsHead": cms,
                    "OffsetRefinementHead": offs.reshape(*offs.shape[:3], -1),
                }
            cms = jax.vmap(lambda a: make_multi_confmaps(a, xv, yv, sigma))(anchors)
            return imgs, {"CentroidConfmapsHead": cms}

        return gt_fn


class _InstanceCropBatchMixin:
    """Instance-level examples: (frame, instance index) pairs."""

    @staticmethod
    def expand_examples(examples):
        """Expand frame examples into per-instance examples."""
        if isinstance(examples, LazyExamples):
            return examples.expand_instances()
        out = []
        for ex in examples:
            n = int((~np.isnan(ex["instances"][..., 0]).all(axis=-1)).sum())
            for i in range(n):
                out.append({**ex, "ctr_ind": i})
        return out

    def setup(self):
        super().setup()
        self._train_examples = self.expand_examples(self._train_examples)
        self._val_examples = self.expand_examples(self._val_examples)

    def make_batch(self, examples, rng):
        return {
            "image": np.stack([e["image"] for e in examples]),
            "instances": np.stack([e["instances"] for e in examples]),
            "track_inds": np.stack([e["track_inds"] for e in examples]),
            "ctr_ind": np.array([e["ctr_ind"] for e in examples], "i4"),
        }

    def _crop_setup(self):
        ic = self.config.data.instance_cropping
        crop_size = ic.crop_size or find_instance_crop_size(
            self.data_readers.training_labels,
            padding=ic.crop_size_detection_padding,
            maximum_stride=self.model.maximum_stride,
            input_scaling=self.config.data.preprocessing.input_scaling,
            min_crop_size=ic.crop_size,
        )
        if ic.crop_size is None:
            ic.crop_size = crop_size
        anchor = ic.center_on_part
        anchor_ind = (
            self.skeleton.node_names.index(anchor)
            if anchor and anchor in self.skeleton.node_names
            else None
        )
        return crop_size, anchor_ind

    def _crop_batch(self, imgs, instances, ctr_ind, crop_size, anchor_ind, scale):
        """Augmented full frames -> centered instance crops + local points."""
        imgs = self._resize_pad(imgs)
        instances = instances * scale
        B = imgs.shape[0]
        target = jnp.take_along_axis(
            instances, ctr_ind[:, None, None, None].astype(jnp.int32), axis=1
        )[:, 0]  # (B, N, 2)
        mins = jnp.nanmin(target, axis=1)
        maxs = jnp.nanmax(target, axis=1)
        centroids = (mins + maxs) / 2.0
        if anchor_ind is not None:
            anchors = target[:, anchor_ind, :]
            missing = jnp.isnan(anchors).any(axis=-1)
            centroids = jnp.where(missing[:, None], centroids, anchors)
        bboxes = make_centered_bboxes(jnp.nan_to_num(centroids), crop_size, crop_size)
        crops = crop_and_resize(imgs, bboxes, jnp.arange(B), (crop_size, crop_size))
        offsets = centroids - (crop_size - 1) / 2.0
        pts = target - offsets[:, None, :]
        all_pts = instances - offsets[:, None, None, :]
        return crops, pts, all_pts


@attr.s(auto_attribs=True)
class TopdownConfmapsTrainer(_InstanceCropBatchMixin, Trainer):
    """Centered-instance confmaps on crops (training.py:1362)."""

    def build_gt_fn(self):
        head = self.config.model.heads.centered_instance
        sigma = head.sigma
        stride = head.output_stride
        scale = self.config.data.preprocessing.input_scaling
        with_offsets = head.offset_refinement
        crop_size, anchor_ind = self._crop_setup()

        def gt_fn(batch, rng):
            imgs = self._prep_images(batch["image"])
            imgs, instances = self._augment(imgs, batch["instances"], rng)
            crops, pts, _ = self._crop_batch(
                imgs, instances, batch["ctr_ind"], crop_size, anchor_ind, scale
            )
            xv, yv = make_grid_vectors(crop_size, crop_size, stride)
            cms = jax.vmap(lambda p: make_confmaps(p, xv, yv, sigma))(pts)
            gt = {"CenteredInstanceConfmapsHead": cms}
            if with_offsets:
                offs = jax.vmap(
                    lambda p, c: mask_offsets(make_offsets(p, xv, yv, stride), c)
                )(pts, cms)
                gt["OffsetRefinementHead"] = offs.reshape(*offs.shape[:3], -1)
            return crops, gt

        return gt_fn


@attr.s(auto_attribs=True)
class BottomUpTrainer(_FullFrameBatchMixin, Trainer):
    """Multi-instance confmaps + PAFs (training.py:1230)."""

    def build_gt_fn(self):
        heads = self.config.model.heads.multi_instance
        cm_sigma = heads.confmaps.sigma
        cm_stride = heads.confmaps.output_stride
        paf_sigma = heads.pafs.sigma
        paf_stride = heads.pafs.output_stride
        scale = self.config.data.preprocessing.input_scaling
        with_offsets = heads.confmaps.offset_refinement
        edge_inds = jnp.asarray(self.skeleton.edge_inds, jnp.int32)

        def gt_fn(batch, rng):
            imgs = self._prep_images(batch["image"])
            imgs, instances = self._augment(imgs, batch["instances"], rng)
            imgs = self._resize_pad(imgs)
            instances = instances * scale
            H, W = imgs.shape[1], imgs.shape[2]
            xv_c, yv_c = make_grid_vectors(H, W, cm_stride)
            xv_p, yv_p = make_grid_vectors(H, W, paf_stride)
            if with_offsets:
                cms, offs = jax.vmap(
                    lambda inst: make_multi_confmaps_with_offsets(
                        inst, xv_c, yv_c, cm_stride, cm_sigma
                    )
                )(instances)
            else:
                cms = jax.vmap(
                    lambda inst: make_multi_confmaps(inst, xv_c, yv_c, cm_sigma)
                )(instances)
            src, dst = get_edge_points(
                instances.reshape(-1, *instances.shape[2:]), edge_inds
            )
            B, I = instances.shape[0], instances.shape[1]
            src = src.reshape(B, I, -1, 2)
            dst = dst.reshape(B, I, -1, 2)
            pafs = jax.vmap(
                lambda s, d: make_multi_pafs(xv_p, yv_p, s, d, paf_sigma)
            )(src, dst)
            pafs = pafs.reshape(*pafs.shape[:3], -1)  # (B, H', W', 2*E)
            gt = {"MultiInstanceConfmapsHead": cms, "PartAffinityFieldsHead": pafs}
            if with_offsets:
                gt["OffsetRefinementHead"] = offs.reshape(*offs.shape[:3], -1)
            return imgs, gt

        return gt_fn


@attr.s(auto_attribs=True)
class BottomUpMultiClassTrainer(_FullFrameBatchMixin, Trainer):
    """Multi-instance confmaps + class maps (training.py:1503)."""

    def build_gt_fn(self):
        heads = self.config.model.heads.multi_class_bottomup
        cm_sigma = heads.confmaps.sigma
        cm_stride = heads.confmaps.output_stride
        class_sigma = heads.class_maps.sigma
        class_stride = heads.class_maps.output_stride
        n_classes = len(heads.class_maps.classes)
        scale = self.config.data.preprocessing.input_scaling
        with_offsets = heads.confmaps.offset_refinement

        def gt_fn(batch, rng):
            imgs = self._prep_images(batch["image"])
            imgs, instances = self._augment(imgs, batch["instances"], rng)
            imgs = self._resize_pad(imgs)
            instances = instances * scale
            H, W = imgs.shape[1], imgs.shape[2]
            xv_c, yv_c = make_grid_vectors(H, W, cm_stride)
            cms = jax.vmap(
                lambda inst: make_multi_confmaps(inst, xv_c, yv_c, cm_sigma)
            )(instances)
            # Class maps: per-instance node-reduced confmaps gated + one-hot.
            xv_k, yv_k = make_grid_vectors(H, W, class_stride)

            def sample_class_maps(inst, tracks):
                per_inst = jax.vmap(
                    lambda p: jnp.max(make_confmaps(p, xv_k, yv_k, class_sigma), axis=-1)
                )(inst)  # (I, H', W')
                per_inst = jnp.transpose(per_inst, (1, 2, 0))  # (H', W', I)
                one_hot = jax.nn.one_hot(tracks, n_classes)  # (I, n_classes)
                total = jnp.sum(per_inst, axis=2, keepdims=True)
                w = jnp.where(per_inst > 0.2, per_inst / jnp.maximum(total, 1e-8), 0.0)
                return jnp.max(w[..., None] * one_hot[None, None], axis=2)

            class_maps = jax.vmap(sample_class_maps)(instances, batch["track_inds"])
            gt = {"MultiInstanceConfmapsHead": cms, "ClassMapsHead": class_maps}
            if with_offsets:
                offs = jax.vmap(
                    lambda inst: make_multi_confmaps_with_offsets(
                        inst, xv_c, yv_c, cm_stride, cm_sigma
                    )[1]
                )(instances)
                gt["OffsetRefinementHead"] = offs.reshape(*offs.shape[:3], -1)
            return imgs, gt

        return gt_fn


@attr.s(auto_attribs=True)
class TopDownMultiClassTrainer(_InstanceCropBatchMixin, Trainer):
    """Centered-instance confmaps + class vectors on crops (training.py:1642)."""

    def build_gt_fn(self):
        heads = self.config.model.heads.multi_class_topdown
        sigma = heads.confmaps.sigma
        stride = heads.confmaps.output_stride
        n_classes = len(heads.class_vectors.classes)
        scale = self.config.data.preprocessing.input_scaling
        with_offsets = heads.confmaps.offset_refinement
        crop_size, anchor_ind = self._crop_setup()

        def gt_fn(batch, rng):
            imgs = self._prep_images(batch["image"])
            imgs, instances = self._augment(imgs, batch["instances"], rng)
            crops, pts, _ = self._crop_batch(
                imgs, instances, batch["ctr_ind"], crop_size, anchor_ind, scale
            )
            xv, yv = make_grid_vectors(crop_size, crop_size, stride)
            cms = jax.vmap(lambda p: make_confmaps(p, xv, yv, sigma))(pts)
            tracks = jnp.take_along_axis(
                batch["track_inds"], batch["ctr_ind"][:, None].astype(jnp.int32), axis=1
            )[:, 0]
            class_vecs = jax.nn.one_hot(tracks, n_classes)
            gt = {
                "CenteredInstanceConfmapsHead": cms,
                "ClassVectorsHead": class_vecs,
            }
            if with_offsets:
                offs = jax.vmap(
                    lambda p, c: mask_offsets(make_offsets(p, xv, yv, stride), c)
                )(pts, cms)
                gt["OffsetRefinementHead"] = offs.reshape(*offs.shape[:3], -1)
            return crops, gt

        return gt_fn
