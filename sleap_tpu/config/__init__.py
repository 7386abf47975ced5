"""Training job configuration tree.

JSON-schema-compatible rebuild of ``/root/reference/sleap/nn/config/``
(``TrainingJobConfig`` at training_job.py:41, model/data/optimization/outputs
submodules). The serialized form must round-trip with existing
``training_config.json`` files from reference model folders and the shipped
``training_profiles/*.json``, so field names and defaults match exactly.
Implementation is attrs dataclasses with a small recursive JSON codec
(unknown fields are ignored for forward compatibility; ``oneof`` groups are
validated on access like config/utils.py:4).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Sequence, Text, Tuple

import attr

from sleap_tpu.version import __version__


# --------------------------------------------------------------------------- #
# Heads
# --------------------------------------------------------------------------- #


@attr.s(auto_attribs=True)
class SingleInstanceConfmapsHeadConfig:
    part_names: Optional[List[Text]] = None
    sigma: float = 5.0
    output_stride: int = 1
    loss_weight: float = 1.0
    offset_refinement: bool = False


@attr.s(auto_attribs=True)
class CentroidsHeadConfig:
    anchor_part: Optional[Text] = None
    sigma: float = 5.0
    output_stride: int = 1
    loss_weight: float = 1.0
    offset_refinement: bool = False


@attr.s(auto_attribs=True)
class CenteredInstanceConfmapsHeadConfig:
    anchor_part: Optional[Text] = None
    part_names: Optional[List[Text]] = None
    sigma: float = 5.0
    output_stride: int = 1
    loss_weight: float = 1.0
    offset_refinement: bool = False


@attr.s(auto_attribs=True)
class MultiInstanceConfmapsHeadConfig:
    part_names: Optional[List[Text]] = None
    sigma: float = 5.0
    output_stride: int = 1
    loss_weight: float = 1.0
    offset_refinement: bool = False


@attr.s(auto_attribs=True)
class PartAffinityFieldsHeadConfig:
    edges: Optional[Sequence[Tuple[Text, Text]]] = None
    sigma: float = 15.0
    output_stride: int = 1
    loss_weight: float = 1.0


@attr.s(auto_attribs=True)
class MultiInstanceConfig:
    confmaps: MultiInstanceConfmapsHeadConfig = attr.ib(
        factory=MultiInstanceConfmapsHeadConfig
    )
    pafs: PartAffinityFieldsHeadConfig = attr.ib(factory=PartAffinityFieldsHeadConfig)


@attr.s(auto_attribs=True)
class ClassMapsHeadConfig:
    classes: Optional[List[Text]] = None
    sigma: float = 5.0
    output_stride: int = 1
    loss_weight: float = 1.0


@attr.s(auto_attribs=True)
class MultiClassBottomUpConfig:
    confmaps: MultiInstanceConfmapsHeadConfig = attr.ib(
        factory=MultiInstanceConfmapsHeadConfig
    )
    class_maps: ClassMapsHeadConfig = attr.ib(factory=ClassMapsHeadConfig)


@attr.s(auto_attribs=True)
class ClassVectorsHeadConfig:
    classes: Optional[List[Text]] = None
    num_fc_layers: int = 1
    num_fc_units: int = 64
    global_pool: bool = True
    output_stride: int = 1
    loss_weight: float = 1.0


@attr.s(auto_attribs=True)
class MultiClassTopDownConfig:
    confmaps: CenteredInstanceConfmapsHeadConfig = attr.ib(
        factory=CenteredInstanceConfmapsHeadConfig
    )
    class_vectors: ClassVectorsHeadConfig = attr.ib(factory=ClassVectorsHeadConfig)


@attr.s(auto_attribs=True)
class HeadsConfig:
    """Oneof: exactly one head group may be set."""

    single_instance: Optional[SingleInstanceConfmapsHeadConfig] = None
    centroid: Optional[CentroidsHeadConfig] = None
    centered_instance: Optional[CenteredInstanceConfmapsHeadConfig] = None
    multi_instance: Optional[MultiInstanceConfig] = None
    multi_class_bottomup: Optional[MultiClassBottomUpConfig] = None
    multi_class_topdown: Optional[MultiClassTopDownConfig] = None

    @property
    def which_oneof_attrib_name(self) -> Optional[str]:
        set_fields = [
            f.name for f in attr.fields(type(self)) if getattr(self, f.name) is not None
        ]
        if len(set_fields) > 1:
            raise ValueError(f"Only one head type may be set; got {set_fields}.")
        return set_fields[0] if set_fields else None

    @property
    def which_oneof(self):
        name = self.which_oneof_attrib_name
        return getattr(self, name) if name else None


# --------------------------------------------------------------------------- #
# Backbones
# --------------------------------------------------------------------------- #


@attr.s(auto_attribs=True)
class LEAPConfig:
    max_stride: int = 8
    output_stride: int = 1
    filters: int = 64
    filters_rate: float = 2
    up_interpolate: bool = False
    stacks: int = 1


@attr.s(auto_attribs=True)
class UNetConfig:
    stem_stride: Optional[int] = None
    max_stride: int = 16
    output_stride: int = 1
    filters: int = 64
    filters_rate: float = 2
    middle_block: bool = True
    up_interpolate: bool = False
    stacks: int = 1
    # TPU-native extension (no reference counterpart): pixel-shuffle the
    # input by this factor before the first convs (lossless downsampling
    # with factor^2 x channels -> far better MXU utilization). Counts
    # toward max_stride. 1 = off.
    space_to_depth: int = 1
    # TPU-native extension: never materialize the s2d map — apply each conv
    # consuming it as an equivalent (3f)x(3f) stride-f conv on the raw image
    # (identical math and parameter tree; kills two HBM layout copies).
    # None defers to the library default.
    fold_s2d_stem: Optional[bool] = None


@attr.s(auto_attribs=True)
class HourglassConfig:
    stem_stride: int = 4
    max_stride: int = 64
    output_stride: int = 4
    stem_filters: int = 128
    filters: int = 256
    filter_increase: int = 128
    stacks: int = 3


@attr.s(auto_attribs=True)
class UpsamplingConfig:
    method: Text = "interpolation"
    skip_connections: Optional[Text] = None
    block_stride: int = 2
    filters: int = 64
    filters_rate: float = 1
    refine_convs: int = 2
    batch_norm: bool = True
    transposed_conv_kernel_size: int = 4


@attr.s(auto_attribs=True)
class ResNetConfig:
    version: Text = "ResNet50"
    weights: Text = "frozen"
    upsampling: Optional[UpsamplingConfig] = None
    max_stride: int = 32
    output_stride: int = 4


@attr.s(auto_attribs=True)
class PretrainedEncoderConfig:
    encoder: Text = "efficientnetb0"
    pretrained: bool = True
    decoder_filters: int = 256
    decoder_filters_rate: float = 1.0
    output_stride: int = 2
    decoder_batchnorm: bool = True


@attr.s(auto_attribs=True)
class HRNetConfig:
    """HigherHRNet backbone (reference hrnet.py:576; experimental there, a
    first-class backbone here)."""

    C: int = 18
    initial_downsampling_steps: int = 2
    n_deconv_modules: int = 1
    bottleneck: bool = False
    deconv_filters: int = 256
    bilinear_upsampling: bool = False
    stem_filters: int = 64


@attr.s(auto_attribs=True)
class BackboneConfig:
    """Oneof: exactly one backbone may be set."""

    leap: Optional[LEAPConfig] = None
    unet: Optional[UNetConfig] = None
    hourglass: Optional[HourglassConfig] = None
    resnet: Optional[ResNetConfig] = None
    pretrained_encoder: Optional[PretrainedEncoderConfig] = None
    hrnet: Optional[HRNetConfig] = None

    @property
    def which_oneof_attrib_name(self) -> Optional[str]:
        set_fields = [
            f.name for f in attr.fields(type(self)) if getattr(self, f.name) is not None
        ]
        if len(set_fields) > 1:
            raise ValueError(f"Only one backbone may be set; got {set_fields}.")
        return set_fields[0] if set_fields else None

    @property
    def which_oneof(self):
        name = self.which_oneof_attrib_name
        return getattr(self, name) if name else None


@attr.s(auto_attribs=True)
class ModelConfig:
    backbone: BackboneConfig = attr.ib(factory=BackboneConfig)
    heads: HeadsConfig = attr.ib(factory=HeadsConfig)
    base_checkpoint: Optional[Text] = None


# --------------------------------------------------------------------------- #
# Data
# --------------------------------------------------------------------------- #


@attr.s(auto_attribs=True)
class LabelsConfig:
    training_labels: Optional[Text] = None
    validation_labels: Optional[Text] = None
    validation_fraction: float = 0.1
    test_labels: Optional[Text] = None
    split_by_inds: bool = False
    training_inds: Optional[List[int]] = None
    validation_inds: Optional[List[int]] = None
    test_inds: Optional[List[int]] = None
    search_path_hints: List[Text] = attr.ib(factory=list)
    skeletons: list = attr.ib(factory=list)  # decoded Skeleton objects


@attr.s(auto_attribs=True)
class PreprocessingConfig:
    ensure_rgb: bool = False
    ensure_grayscale: bool = False
    imagenet_mode: Optional[Text] = None
    input_scaling: float = 1.0
    pad_to_stride: Optional[int] = None
    resize_and_pad_to_target: bool = True
    target_height: Optional[int] = None
    target_width: Optional[int] = None


@attr.s(auto_attribs=True)
class InstanceCroppingConfig:
    center_on_part: Optional[Text] = None
    crop_size: Optional[int] = None
    crop_size_detection_padding: int = 16


@attr.s(auto_attribs=True)
class DataConfig:
    labels: LabelsConfig = attr.ib(factory=LabelsConfig)
    preprocessing: PreprocessingConfig = attr.ib(factory=PreprocessingConfig)
    instance_cropping: InstanceCroppingConfig = attr.ib(factory=InstanceCroppingConfig)


# --------------------------------------------------------------------------- #
# Optimization
# --------------------------------------------------------------------------- #


@attr.s(auto_attribs=True)
class AugmentationConfig:
    rotate: bool = False
    rotation_min_angle: float = -180
    rotation_max_angle: float = 180
    translate: bool = False
    translate_min: int = -5
    translate_max: int = 5
    scale: bool = False
    scale_min: float = 0.9
    scale_max: float = 1.1
    uniform_noise: bool = False
    uniform_noise_min_val: float = 0.0
    uniform_noise_max_val: float = 10.0
    gaussian_noise: bool = False
    gaussian_noise_mean: float = 5.0
    gaussian_noise_stddev: float = 1.0
    contrast: bool = False
    contrast_min_gamma: float = 0.5
    contrast_max_gamma: float = 2.0
    brightness: bool = False
    brightness_min_val: float = 0.0
    brightness_max_val: float = 10.0
    random_crop: bool = False
    random_crop_height: int = 256
    random_crop_width: int = 256
    random_flip: bool = False
    flip_horizontal: bool = True


@attr.s(auto_attribs=True)
class HardKeypointMiningConfig:
    online_mining: bool = False
    hard_to_easy_ratio: float = 2.0
    min_hard_keypoints: int = 2
    max_hard_keypoints: Optional[int] = None
    loss_scale: float = 5.0


@attr.s(auto_attribs=True)
class LearningRateScheduleConfig:
    reduce_on_plateau: bool = True
    reduction_factor: float = 0.5
    plateau_min_delta: float = 1e-6
    plateau_patience: int = 5
    plateau_cooldown: int = 3
    min_learning_rate: float = 1e-8


@attr.s(auto_attribs=True)
class EarlyStoppingConfig:
    stop_training_on_plateau: bool = True
    plateau_min_delta: float = 1e-6
    plateau_patience: int = 10


@attr.s(auto_attribs=True)
class OptimizationConfig:
    preload_data: bool = True
    augmentation_config: AugmentationConfig = attr.ib(factory=AugmentationConfig)
    online_shuffling: bool = True
    shuffle_buffer_size: int = 128
    prefetch: bool = True
    batch_size: int = 8
    batches_per_epoch: Optional[int] = None
    min_batches_per_epoch: int = 200
    val_batches_per_epoch: Optional[int] = None
    min_val_batches_per_epoch: int = 10
    epochs: int = 100
    optimizer: Text = "adam"
    initial_learning_rate: float = 1e-4
    learning_rate_schedule: LearningRateScheduleConfig = attr.ib(
        factory=LearningRateScheduleConfig
    )
    hard_keypoint_mining: HardKeypointMiningConfig = attr.ib(
        factory=HardKeypointMiningConfig
    )
    early_stopping: EarlyStoppingConfig = attr.ib(factory=EarlyStoppingConfig)
    # TPU-native extension (no reference counterpart): run the forward and
    # backward pass in bfloat16 on the MXU while keeping parameters, optimizer
    # state, and the loss in float32. Checkpoints are dtype-identical to f32
    # training.
    mixed_precision: bool = False


# --------------------------------------------------------------------------- #
# Outputs
# --------------------------------------------------------------------------- #


@attr.s(auto_attribs=True)
class CheckpointingConfig:
    initial_model: bool = False
    best_model: bool = True
    every_epoch: bool = False
    latest_model: bool = False
    final_model: bool = False


@attr.s(auto_attribs=True)
class TensorBoardConfig:
    write_logs: bool = False
    loss_frequency: Text = "epoch"
    architecture_graph: bool = False
    profile_graph: bool = False
    visualizations: bool = True


@attr.s(auto_attribs=True)
class ZMQConfig:
    subscribe_to_controller: bool = False
    controller_address: Text = "tcp://127.0.0.1:9000"
    controller_polling_timeout: int = 10
    publish_updates: bool = False
    publish_address: Text = "tcp://127.0.0.1:9001"


@attr.s(auto_attribs=True)
class OutputsConfig:
    save_outputs: bool = True
    run_name: Optional[Text] = None
    run_name_prefix: Text = ""
    run_name_suffix: Optional[Text] = None
    runs_folder: Text = "models"
    tags: List[Text] = attr.ib(factory=list)
    save_visualizations: bool = True
    keep_viz_images: bool = False
    zip_outputs: bool = False
    log_to_csv: bool = True
    checkpointing: CheckpointingConfig = attr.ib(factory=CheckpointingConfig)
    tensorboard: TensorBoardConfig = attr.ib(factory=TensorBoardConfig)
    zmq: ZMQConfig = attr.ib(factory=ZMQConfig)

    @property
    def run_path(self) -> Text:
        if self.run_name is None:
            raise ValueError("run_name must be set to determine run_path.")
        name = f"{self.run_name_prefix}{self.run_name}{self.run_name_suffix or ''}"
        return os.path.join(self.runs_folder, name)


# --------------------------------------------------------------------------- #
# Root
# --------------------------------------------------------------------------- #


@attr.s(auto_attribs=True)
class TrainingJobConfig:
    data: DataConfig = attr.ib(factory=DataConfig)
    model: ModelConfig = attr.ib(factory=ModelConfig)
    optimization: OptimizationConfig = attr.ib(factory=OptimizationConfig)
    outputs: OutputsConfig = attr.ib(factory=OutputsConfig)
    name: Optional[Text] = ""
    description: Optional[Text] = ""
    sleap_version: Optional[Text] = __version__
    filename: Optional[Text] = ""

    @classmethod
    def from_json(cls, json_data: Text) -> "TrainingJobConfig":
        return _structure(cls, json.loads(_strip_comments(json_data)))

    @classmethod
    def load_json(
        cls, filename: Text, load_training_config: bool = True
    ) -> "TrainingJobConfig":
        """Load from a JSON file or a model run directory.

        Directories are resolved preferring ``training_config.json`` then
        ``initial_config.json`` (reference training_job.py:93-125).
        """
        if os.path.isdir(filename):
            candidates = (
                ["training_config.json", "initial_config.json"]
                if load_training_config
                else ["initial_config.json", "training_config.json"]
            )
            for cand in candidates:
                p = os.path.join(filename, cand)
                if os.path.exists(p):
                    filename = p
                    break
            else:
                raise FileNotFoundError(f"No config JSON found in {filename}.")
        with open(filename, "r") as f:
            cfg = cls.from_json(f.read())
        cfg.filename = filename
        return cfg

    def to_json(self) -> str:
        return json.dumps(_unstructure(self), indent=4)

    def save_json(self, filename: Text) -> None:
        with open(filename, "w") as f:
            f.write(self.to_json())


def load_config(filename: Text, load_training_config: bool = True) -> TrainingJobConfig:
    """Module-level loader mirroring ``sleap.load_config``."""
    return TrainingJobConfig.load_json(
        filename, load_training_config=load_training_config
    )


# --------------------------------------------------------------------------- #
# JSON (de)structuring
# --------------------------------------------------------------------------- #

_COMMENT_RE = re.compile(r"^\s*//.*$", re.MULTILINE)
_BLOCK_COMMENT_RE = re.compile(r"/\*.*?\*/", re.DOTALL)


def _strip_comments(text: str) -> str:
    """Allow //-line and /* block */ comments (the reference runs configs
    through jsmin, training_job.py:163). Whole-line // only, so string
    values containing e.g. "http://" are untouched."""
    return _COMMENT_RE.sub("", _BLOCK_COMMENT_RE.sub("", text))


def _structure(cls, data):
    """Recursively build an attrs instance from a JSON dict.

    Unknown fields are ignored; Optional[attrs] fields recurse; the
    ``skeletons`` field decodes via the Skeleton JSON codec.
    """
    if data is None:
        return None
    if not attr.has(cls):
        return data
    kwargs = {}
    for field in attr.fields(cls):
        if field.name not in data:
            continue
        value = data[field.name]
        target = _field_attrs_type(field)
        if field.name == "skeletons" and isinstance(value, list):
            from sleap_tpu.core.skeleton import Skeleton

            kwargs[field.name] = [
                Skeleton.from_dict(s) if isinstance(s, dict) else s for s in value
            ]
        elif target is not None:
            kwargs[field.name] = _structure(target, value)
        else:
            kwargs[field.name] = value
    return cls(**kwargs)


def _field_attrs_type(field):
    """The attrs class a field holds, unwrapping Optional[...]."""
    t = field.type
    if isinstance(t, str):
        t = _TYPE_REGISTRY.get(t.replace("Optional[", "").replace("]", ""))
        return t
    return None


def _unstructure(obj):
    if obj is None or isinstance(obj, (int, float, str, bool)):
        return obj
    if attr.has(type(obj)):
        out = {}
        for field in attr.fields(type(obj)):
            value = getattr(obj, field.name)
            if field.name == "skeletons":
                out[field.name] = [
                    s.to_dict() if hasattr(s, "to_dict") else s for s in value
                ]
            else:
                out[field.name] = _unstructure(value)
        return out
    if isinstance(obj, (list, tuple)):
        return [_unstructure(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _unstructure(v) for k, v in obj.items()}
    return obj


_TYPE_REGISTRY = {
    cls.__name__: cls
    for cls in [
        SingleInstanceConfmapsHeadConfig,
        CentroidsHeadConfig,
        CenteredInstanceConfmapsHeadConfig,
        MultiInstanceConfmapsHeadConfig,
        PartAffinityFieldsHeadConfig,
        MultiInstanceConfig,
        ClassMapsHeadConfig,
        MultiClassBottomUpConfig,
        ClassVectorsHeadConfig,
        MultiClassTopDownConfig,
        HeadsConfig,
        LEAPConfig,
        UNetConfig,
        HourglassConfig,
        UpsamplingConfig,
        ResNetConfig,
        PretrainedEncoderConfig,
        HRNetConfig,
        BackboneConfig,
        ModelConfig,
        LabelsConfig,
        PreprocessingConfig,
        InstanceCroppingConfig,
        DataConfig,
        AugmentationConfig,
        HardKeypointMiningConfig,
        LearningRateScheduleConfig,
        EarlyStoppingConfig,
        OptimizationConfig,
        CheckpointingConfig,
        TensorBoardConfig,
        ZMQConfig,
        OutputsConfig,
        DataConfig,
        TrainingJobConfig,
    ]
}
