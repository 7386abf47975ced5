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
