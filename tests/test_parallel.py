"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_pytree,
    shard_pytree_batch,
)


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(n_devices=8, spatial=2)


def test_make_mesh_shape(mesh8):
    assert mesh8.shape == {"data": 4, "spatial": 2}


def test_shard_batch(mesh8):
    batch = {"image": np.zeros((8, 16, 16, 1), "uint8")}
    sharded = shard_pytree_batch(batch, mesh8)
    assert sharded["image"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_sharded_inference_matches_single_device(mesh8):
    """A jitted conv+peaks step gives identical results sharded vs not."""
    from sleap_tpu.parallel.distributed import sharded_infer_fn

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, 1, 4))

    def infer(images):
        x = images.astype(jnp.float32) / 255.0
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return {"out": y.sum(axis=(1, 2))}

    images = np.random.default_rng(0).integers(0, 255, (8, 32, 32, 1), np.uint8)
    ref = infer(jnp.asarray(images))
    sharded = sharded_infer_fn(infer, mesh8)(jnp.asarray(images))
    np.testing.assert_allclose(
        np.asarray(ref["out"]), np.asarray(sharded["out"]), rtol=1e-5
    )


def test_dryrun_multichip_entrypoint(mesh8):
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def _sorted_points(labels):
    return [
        np.array(sorted([i.numpy().tolist() for i in lf.predicted_instances]))
        for lf in labels.labeled_frames
    ]


@pytest.mark.slow
def test_sharded_topdown_predictor_matches_single_device(mesh8):
    """A real TopDownPredictor (reference centroid + centered-instance
    checkpoints) gives identical keypoints data-parallel vs single-device."""
    import os

    d = "/root/reference/tests/data/models"
    centroid = os.path.join(d, "minimal_instance.UNet.centroid")
    instance = os.path.join(d, "minimal_instance.UNet.centered_instance")
    if not (os.path.isdir(centroid) and os.path.isdir(instance)):
        pytest.skip("reference fixtures unavailable")
    import sleap_tpu
    from sleap_tpu.inference.predictors import TopDownPredictor
    from sleap_tpu.parallel.distributed import make_sharded_predictor

    gt = sleap_tpu.load_file(os.path.join(instance, "labels_gt.val.slp"))

    def make():
        return TopDownPredictor.from_trained_models(
            centroid_model_path=centroid,
            confmap_model_path=instance,
            max_instances=4,
            batch_size=2,
        )

    ref = make().predict(gt)
    sharded = make_sharded_predictor(make(), mesh8).predict(gt)
    assert len(ref) == len(sharded)
    for a, b in zip(_sorted_points(ref), _sorted_points(sharded)):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-3)


@pytest.mark.slow
def test_sharded_bottomup_trainer_matches_single_device(mesh8, tmp_path):
    """A real 2-epoch BottomUpTrainer run sharded over 8 devices reproduces
    the single-device parameters (same batches, same rng; only the reduce
    order differs)."""
    from sleap_tpu import config as cfg
    from sleap_tpu.core.instance import Instance, LabeledFrame
    from sleap_tpu.core.labels import Labels
    from sleap_tpu.core.skeleton import Skeleton
    from sleap_tpu.io.video import Video
    from sleap_tpu.training.trainer import Trainer

    rng = np.random.default_rng(0)
    skel = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)], name="S")
    video = Video.from_numpy(rng.integers(0, 255, (6, 64, 64, 1), np.uint8))
    lfs = [
        LabeledFrame(
            video=video, frame_idx=i,
            instances=[
                Instance(skeleton=skel, points=rng.uniform(10, 30, (2, 2))),
                Instance(skeleton=skel, points=rng.uniform(34, 54, (2, 2))),
            ],
        )
        for i in range(6)
    ]
    labels = Labels(lfs)

    def run(n_devices, name, spatial=1):
        c = cfg.TrainingJobConfig()
        c.model.backbone.unet = cfg.UNetConfig(
            max_stride=4, output_stride=2, filters=4, filters_rate=1.5
        )
        c.model.heads.multi_instance = cfg.MultiInstanceConfig(
            confmaps=cfg.MultiInstanceConfmapsHeadConfig(output_stride=2, sigma=3.0),
            pafs=cfg.PartAffinityFieldsHeadConfig(output_stride=2, sigma=3.0),
        )
        c.optimization.epochs = 2
        c.optimization.batch_size = 8  # divisible by the data axis
        c.optimization.batches_per_epoch = 2
        c.optimization.val_batches_per_epoch = 1
        c.optimization.initial_learning_rate = 1e-3
        c.data.preprocessing.pad_to_stride = 4
        c.outputs.runs_folder = str(tmp_path)
        c.outputs.run_name = name
        trainer = Trainer.from_config(
            c, training_labels=labels, validation_labels=labels,
            n_devices=n_devices, spatial_sharding=spatial,
        )
        trainer.evaluate = lambda: None
        trainer.train()
        return trainer.variables["params"]

    def check(p_a, p_b):
        flat_s, _ = jax.tree_util.tree_flatten_with_path(p_a)
        flat_d, _ = jax.tree_util.tree_flatten_with_path(p_b)
        assert len(flat_s) == len(flat_d)
        for (path, a), (_, b) in zip(flat_s, flat_d):
            # Adam's sqrt(v) normalization amplifies reduce-order float
            # noise; observed max drift after 4 steps is ~5e-5.
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
                err_msg=f"param mismatch at {path}",
            )

    p_single = run(None, "single")
    check(p_single, run(8, "sharded"))
    # (data: 4, spatial: 2) mesh: frame height additionally sharded; XLA
    # inserts conv halo exchanges. Same optimization trajectory.
    check(p_single, run(8, "sharded_spatial", spatial=2))
