"""Training smoke tests: 2 quick epochs per head type on synthetic data.

Mirrors the reference's test_training.py strategy (1-epoch trainings per
head type on minimal labels, SURVEY §4).
"""

import numpy as np
import pytest

from sleap_tpu import config as cfg
from sleap_tpu.core.instance import Instance, LabeledFrame, Track
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video
from sleap_tpu.training.trainer import DataReaders, Trainer


@pytest.fixture
def tiny_labels():
    rng = np.random.default_rng(0)
    skel = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)], name="S")
    frames = rng.integers(0, 255, (6, 64, 64, 1), np.uint8)
    video = Video.from_numpy(frames)
    track_a, track_b = Track(0, "A"), Track(0, "B")
    lfs = []
    for i in range(6):
        pts1 = rng.uniform(10, 30, (2, 2))
        pts2 = rng.uniform(34, 54, (2, 2))
        lfs.append(
            LabeledFrame(
                video=video, frame_idx=i,
                instances=[
                    Instance(skeleton=skel, points=pts1, track=track_a),
                    Instance(skeleton=skel, points=pts2, track=track_b),
                ],
            )
        )
    return Labels(lfs)


def _base_cfg(tmp_path, name):
    c = cfg.TrainingJobConfig()
    c.model.backbone.unet = cfg.UNetConfig(max_stride=4, output_stride=2, filters=4, filters_rate=1.5)
    c.optimization.epochs = 2
    c.optimization.batch_size = 2
    c.optimization.batches_per_epoch = 2
    c.optimization.val_batches_per_epoch = 1
    c.optimization.initial_learning_rate = 1e-3
    c.data.preprocessing.pad_to_stride = 4
    c.outputs.runs_folder = str(tmp_path)
    c.outputs.run_name = name
    return c


def _run(config, labels):
    trainer = Trainer.from_config(config, training_labels=labels, validation_labels=labels)
    trainer.evaluate = lambda: None  # skip slow predictor eval in smoke tests
    trainer.train()
    import os

    assert os.path.isdir(os.path.join(trainer.run_path, "best_model.ckpt"))
    assert os.path.exists(os.path.join(trainer.run_path, "training_config.json"))
    assert os.path.exists(os.path.join(trainer.run_path, "training_log.csv"))
    return trainer


@pytest.mark.slow
def test_train_single_instance(tiny_labels, tmp_path):
    c = _base_cfg(tmp_path, "single")
    c.model.heads.single_instance = cfg.SingleInstanceConfmapsHeadConfig(
        output_stride=2, sigma=3.0
    )
    _run(c, tiny_labels)


@pytest.mark.slow
def test_train_centroid(tiny_labels, tmp_path):
    c = _base_cfg(tmp_path, "centroid")
    c.model.heads.centroid = cfg.CentroidsHeadConfig(output_stride=2, sigma=3.0, offset_refinement=True)
    _run(c, tiny_labels)


@pytest.mark.slow
def test_train_centered_instance(tiny_labels, tmp_path):
    c = _base_cfg(tmp_path, "topdown")
    c.model.heads.centered_instance = cfg.CenteredInstanceConfmapsHeadConfig(
        output_stride=2, sigma=3.0
    )
    c.data.instance_cropping.crop_size = 32
    _run(c, tiny_labels)


@pytest.mark.slow
def test_train_bottomup(tiny_labels, tmp_path):
    c = _base_cfg(tmp_path, "bottomup")
    c.model.heads.multi_instance = cfg.MultiInstanceConfig(
        confmaps=cfg.MultiInstanceConfmapsHeadConfig(output_stride=2, sigma=3.0),
        pafs=cfg.PartAffinityFieldsHeadConfig(output_stride=2, sigma=3.0),
    )
    _run(c, tiny_labels)


@pytest.mark.slow
def test_train_bottomup_multiclass(tiny_labels, tmp_path):
    c = _base_cfg(tmp_path, "bu_multiclass")
    c.model.heads.multi_class_bottomup = cfg.MultiClassBottomUpConfig(
        confmaps=cfg.MultiInstanceConfmapsHeadConfig(output_stride=2, sigma=3.0),
        class_maps=cfg.ClassMapsHeadConfig(output_stride=2, sigma=3.0),
    )
    _run(c, tiny_labels)


@pytest.mark.slow
def test_train_topdown_multiclass(tiny_labels, tmp_path):
    c = _base_cfg(tmp_path, "td_multiclass")
    c.model.heads.multi_class_topdown = cfg.MultiClassTopDownConfig(
        confmaps=cfg.CenteredInstanceConfmapsHeadConfig(output_stride=2, sigma=3.0),
        class_vectors=cfg.ClassVectorsHeadConfig(output_stride=4, num_fc_layers=1),
    )
    c.data.instance_cropping.crop_size = 32
    _run(c, tiny_labels)


@pytest.mark.slow
def test_train_with_augmentation_and_ohkm(tiny_labels, tmp_path):
    c = _base_cfg(tmp_path, "augmented")
    c.model.heads.single_instance = cfg.SingleInstanceConfmapsHeadConfig(output_stride=2, sigma=3.0)
    aug = c.optimization.augmentation_config
    aug.rotate = True
    aug.scale = True
    aug.uniform_noise = True
    aug.contrast = True
    aug.brightness = True
    aug.random_flip = True
    c.optimization.hard_keypoint_mining.online_mining = True
    c.optimization.optimizer = "amsgrad"
    _run(c, tiny_labels)


@pytest.mark.slow
def test_train_hourglass_with_batchnorm(tiny_labels, tmp_path):
    """Hourglass uses BatchNorm: exercises mutable batch_stats in training."""
    c = cfg.TrainingJobConfig()
    # Stacked hourglass requires symmetric encoder/decoder: output_stride
    # must equal stem_stride (asymmetric configs raise, as in the reference).
    c.model.backbone.hourglass = cfg.HourglassConfig(
        stem_stride=2, max_stride=8, output_stride=2,
        stem_filters=4, filters=8, filter_increase=4, stacks=2,
    )
    c.model.heads.multi_instance = cfg.MultiInstanceConfig(
        confmaps=cfg.MultiInstanceConfmapsHeadConfig(output_stride=2, sigma=3.0),
        pafs=cfg.PartAffinityFieldsHeadConfig(output_stride=2, sigma=3.0),
    )
    c.optimization.epochs = 2
    c.optimization.batch_size = 2
    c.optimization.batches_per_epoch = 2
    c.optimization.val_batches_per_epoch = 1
    c.data.preprocessing.pad_to_stride = 8
    c.outputs.runs_folder = str(tmp_path)
    c.outputs.run_name = "hourglass"
    trainer = _run(c, tiny_labels)
    # Batch stats must have been updated and checkpointed.
    assert "batch_stats" in trainer.variables


@pytest.mark.slow
def test_checkpoint_surface_and_resume(tiny_labels, tmp_path):
    """Full checkpoint-event surface (reference training.py:415-462,996):
    initial/every-epoch/latest/final checkpoints, run-folder zip, and
    resume-from-latest via base_checkpoint."""
    import os

    c = _base_cfg(tmp_path, "ckpts")
    c.model.heads.centroid = cfg.CentroidsHeadConfig(output_stride=2, sigma=3.0)
    ck = c.outputs.checkpointing
    ck.initial_model = True
    ck.every_epoch = True
    ck.latest_model = True
    ck.final_model = True
    c.outputs.zip_outputs = True
    trainer = _run(c, tiny_labels)
    run = trainer.run_path
    for name in (
        "initial_model.ckpt",
        "model.epoch0000.ckpt",
        "model.epoch0001.ckpt",
        "latest_model.ckpt",
        "final_model.ckpt",
    ):
        assert os.path.isdir(os.path.join(run, name)), name
    assert os.path.exists(run + ".zip")

    # Resume: point base_checkpoint at the latest checkpoint directory.
    from sleap_tpu.inference.predictors import load_trained_model

    tm = load_trained_model(os.path.join(run, "latest_model.ckpt"))
    assert tm.variables is not None
    c2 = _base_cfg(tmp_path, "ckpts_resumed")
    c2.model.heads.centroid = cfg.CentroidsHeadConfig(output_stride=2, sigma=3.0)
    c2.model.base_checkpoint = os.path.join(run, "latest_model.ckpt")
    c2.optimization.epochs = 1
    _run(c2, tiny_labels)


@pytest.mark.slow
def test_profile_graph_writes_trace(tiny_labels, tmp_path):
    """TensorBoardConfig.profile_graph captures a first-epoch JAX profiler
    trace into <run>/profile."""
    import os

    c = _base_cfg(tmp_path, "profiled")
    c.model.heads.centroid = cfg.CentroidsHeadConfig(output_stride=2, sigma=3.0)
    c.outputs.tensorboard.profile_graph = True
    trainer = _run(c, tiny_labels)
    profile_dir = os.path.join(trainer.run_path, "profile")
    assert os.path.isdir(profile_dir)
    found = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(profile_dir)
        for f in fs
        if f.endswith((".trace.json.gz", ".xplane.pb", ".json.gz"))
    ]
    assert found, "no profiler trace files written"


@pytest.fixture
def mixed_size_labels():
    """Two videos with different resolutions in one project."""
    rng = np.random.default_rng(1)
    skel = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)], name="S")
    video_small = Video.from_numpy(rng.integers(0, 255, (3, 48, 48, 1), np.uint8))
    video_big = Video.from_numpy(rng.integers(0, 255, (3, 64, 96, 1), np.uint8))
    lfs = []
    for i in range(3):
        lfs.append(
            LabeledFrame(
                video=video_small, frame_idx=i,
                instances=[Instance(skeleton=skel, points=rng.uniform(5, 40, (2, 2)))],
            )
        )
        lfs.append(
            LabeledFrame(
                video=video_big, frame_idx=i,
                instances=[Instance(skeleton=skel, points=rng.uniform(5, 60, (2, 2)))],
            )
        )
    return Labels(lfs)


@pytest.mark.slow
def test_train_mixed_size_videos(mixed_size_labels, tmp_path):
    """Mixed-resolution projects size-match to the largest video
    (reference SizeMatcher, data/resizing.py:257) instead of crashing."""
    c = _base_cfg(tmp_path, "mixed")
    c.model.heads.single_instance = cfg.SingleInstanceConfmapsHeadConfig(
        output_stride=2, sigma=3.0
    )
    trainer = _run(c, mixed_size_labels)
    # Every cached example was matched to (64, 96).
    shapes = {e["image"].shape for e in trainer._train_examples}
    assert shapes == {(64, 96, 1)}


def test_size_match_scales_points():
    from sleap_tpu.training.trainer import size_match_image

    img = np.arange(48 * 48, dtype=np.uint8).reshape(48, 48, 1)
    out, scale = size_match_image(img, (64, 96))
    assert out.shape == (64, 96, 1)
    assert scale == pytest.approx(64 / 48)
    # Padding region is zero.
    assert out[:, 64:].sum() == 0


@pytest.mark.slow
def test_train_streaming_no_preload(tiny_labels, tmp_path):
    """preload_data=False streams frames by decoding on access."""
    from sleap_tpu.training.trainer import LazyExamples

    c = _base_cfg(tmp_path, "streaming")
    c.model.heads.centroid = cfg.CentroidsHeadConfig(output_stride=2, sigma=3.0)
    c.optimization.preload_data = False
    trainer = _run(c, tiny_labels)
    assert isinstance(trainer._train_examples, LazyExamples)


@pytest.mark.slow
def test_train_unet_space_to_depth(tiny_labels, tmp_path):
    """The TPU-native s2d stem trains end-to-end."""
    c = cfg.TrainingJobConfig()
    c.model.backbone.unet = cfg.UNetConfig(
        max_stride=8, output_stride=4, filters=8, space_to_depth=4
    )
    c.model.heads.centroid = cfg.CentroidsHeadConfig(output_stride=4, sigma=2.5)
    c.optimization.epochs = 2
    c.optimization.batch_size = 2
    c.optimization.batches_per_epoch = 2
    c.optimization.val_batches_per_epoch = 1
    c.data.preprocessing.pad_to_stride = 8
    c.outputs.runs_folder = str(tmp_path)
    c.outputs.run_name = "s2d"
    _run(c, tiny_labels)


@pytest.mark.slow
def test_train_mixed_precision(tiny_labels, tmp_path):
    """bf16 compute path: trains end-to-end, params/checkpoints stay f32."""
    import jax
    import jax.numpy as jnp

    c = _base_cfg(tmp_path, "mixed")
    c.model.heads.centered_instance = cfg.CenteredInstanceConfmapsHeadConfig(
        output_stride=2, sigma=3.0
    )
    c.data.instance_cropping.crop_size = 32
    c.optimization.mixed_precision = True
    trainer = _run(c, tiny_labels)
    assert trainer.module.compute_dtype == jnp.bfloat16
    leaves = jax.tree_util.tree_leaves(trainer.variables["params"])
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)
    # Head outputs come back bf16; the jitted loss must still be f32-finite.
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    out = trainer.module.apply(trainer.variables, x, train=False)
    assert all(v.dtype == jnp.bfloat16 for v in out.values())


@pytest.mark.slow
def test_train_evaluate_then_predict_own_checkpoint(tiny_labels, tmp_path):
    """The reference's fixture-checkpoint cycle on OUR artifacts: train a
    tiny bottom-up model, let post-training evaluation write labels_pr +
    metrics, then load the run folder with sleap_tpu.load_model and predict
    (reference tests run real predictors on trained fixture models,
    tests/nn/test_inference.py:637-907)."""
    import os

    import sleap_tpu

    c = _base_cfg(tmp_path, "bu_roundtrip")
    c.model.backbone.unet.filters = 8
    c.optimization.epochs = 15
    c.optimization.batches_per_epoch = 6
    c.optimization.initial_learning_rate = 5e-3
    c.model.heads.multi_instance = cfg.MultiInstanceConfig(
        confmaps=cfg.MultiInstanceConfmapsHeadConfig(output_stride=2, sigma=3.0),
        pafs=cfg.PartAffinityFieldsHeadConfig(output_stride=2, sigma=3.0),
    )
    trainer = Trainer.from_config(
        c, training_labels=tiny_labels, validation_labels=tiny_labels
    )
    trainer.train()  # evaluate() NOT mocked: writes labels_pr + metrics

    for artifact in (
        "labels_pr.val.slp",
        "metrics.val.npz",
        "labels_pr.train.slp",
        "metrics.train.npz",
    ):
        assert os.path.exists(os.path.join(trainer.run_path, artifact)), artifact
    metrics = sleap_tpu.load_metrics(trainer.run_path, split="val")
    assert "oks_voc.mAP" in metrics

    predictor = sleap_tpu.load_model(
        trainer.run_path,
        batch_size=2,
        peak_threshold=0.01,  # toy 15-epoch model; peaks are low but placed
        min_line_scores=-1.0,
    )
    preds = predictor.predict(tiny_labels)
    assert len(preds) > 0
    assert any(len(lf.predicted_instances) > 0 for lf in preds.labeled_frames)
    # Coordinates land inside the image.
    for lf in preds.labeled_frames:
        for inst in lf.predicted_instances:
            xy = inst.numpy()
            ok = ~np.isnan(xy)
            assert (xy[ok] >= -32).all() and (xy[ok] <= 96).all()
