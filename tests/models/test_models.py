import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_tpu import config as cfg
from sleap_tpu.models.heads import (
    CentroidConfmapsHead,
    MultiInstanceConfmapsHead,
    PartAffinityFieldsHead,
    SingleInstanceConfmapsHead,
)
from sleap_tpu.models.hourglass import Hourglass
from sleap_tpu.models.leap import LeapCNN
from sleap_tpu.models.model import Model, find_head
from sleap_tpu.models.unet import UNet


def count_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def test_unet_default_param_count():
    """Reference claims ~34.5M params for the default UNet (unet.py:46)."""
    model = Model(
        backbone=UNet(),
        heads=[SingleInstanceConfmapsHead(part_names=["a"], output_stride=1)],
    )
    _, variables = model.init(jax.random.PRNGKey(0), (64, 64, 1))
    n = count_params(variables)
    assert 34.4e6 < n < 34.6e6


def test_unet_from_reference_config_exact_params():
    """Param count must match the reference checkpoint exactly (127,235)."""
    import os

    d = "/root/reference/tests/data/models/minimal_instance.UNet.centroid"
    if not os.path.exists(d):
        pytest.skip("reference fixture unavailable")
    c = cfg.load_config(d)
    model = Model.from_config(c.model, skeleton=c.data.labels.skeletons[0])
    _, variables = model.init(jax.random.PRNGKey(0), (192, 192, 1))
    assert count_params(variables) == 127235


def test_unet_output_strides():
    model = Model(
        backbone=UNet(filters=8, down_blocks=3, up_blocks=2),
        heads=[
            MultiInstanceConfmapsHead(part_names=["a", "b"], output_stride=2),
            PartAffinityFieldsHead(edges=[("a", "b")], output_stride=4),
        ],
    )
    module, variables = model.init(jax.random.PRNGKey(0), (64, 64, 1))
    out = module.apply(variables, jnp.zeros((1, 64, 64, 1)), train=False)
    assert out["MultiInstanceConfmapsHead"].shape == (1, 32, 32, 2)
    assert out["PartAffinityFieldsHead"].shape == (1, 16, 16, 2)


def test_leap_default_param_count():
    """Reference claims ~10.8M params for the default LEAP CNN (leap.py:15)."""
    model = Model(
        backbone=LeapCNN(),
        heads=[SingleInstanceConfmapsHead(part_names=["a"], output_stride=1)],
    )
    _, variables = model.init(jax.random.PRNGKey(0), (64, 64, 1))
    n = count_params(variables)
    assert 10.5e6 < n < 11.1e6


def test_hourglass_stacked_outputs():
    model = Model(
        backbone=Hourglass(
            down_blocks=2,
            up_blocks=2,
            stem_filters=8,
            stem_stride=4,
            filters=16,
            filter_increase=8,
            stacks=2,
        ),
        heads=[MultiInstanceConfmapsHead(part_names=["a", "b"], output_stride=4)],
    )
    module, variables = model.init(jax.random.PRNGKey(0), (64, 64, 1))
    out = module.apply(variables, jnp.zeros((1, 64, 64, 1)), train=False)
    # Intermediate supervision: one output per stack.
    assert out["MultiInstanceConfmapsHead_stack0"].shape == (1, 16, 16, 2)
    assert out["MultiInstanceConfmapsHead"].shape == (1, 16, 16, 2)
    assert "batch_stats" in variables


def test_hourglass_stacked_asymmetric_raises():
    """Asymmetric encoder/decoder with stacks>1 must raise (the next stack's
    encoder would re-enter at the wrong stride; reference
    encoder_decoder.py:632-638 raises the same)."""
    import pytest

    model = Model(
        backbone=Hourglass(
            down_blocks=2,
            up_blocks=1,  # decoder stops at stride 4 != stem stride 2
            stem_filters=4,
            stem_stride=2,
            filters=8,
            filter_increase=4,
            stacks=2,
        ),
        heads=[MultiInstanceConfmapsHead(part_names=["a", "b"], output_stride=4)],
    )
    with pytest.raises(ValueError, match="symmetric encoder and decoder"):
        model.init(jax.random.PRNGKey(0), (64, 64, 1))


def test_model_from_config_multiclass():
    c = cfg.ModelConfig(
        backbone=cfg.BackboneConfig(unet=cfg.UNetConfig(max_stride=8, output_stride=2, filters=8)),
        heads=cfg.HeadsConfig(
            multi_class_topdown=cfg.MultiClassTopDownConfig(
                confmaps=cfg.CenteredInstanceConfmapsHeadConfig(
                    part_names=["a", "b"], output_stride=2
                ),
                class_vectors=cfg.ClassVectorsHeadConfig(
                    classes=["m", "f"], num_fc_layers=2, output_stride=8
                ),
            )
        ),
    )
    model = Model.from_config(c)
    module, variables = model.init(jax.random.PRNGKey(0), (32, 32, 1))
    out = module.apply(variables, jnp.zeros((3, 32, 32, 1)), train=False)
    assert out["CenteredInstanceConfmapsHead"].shape == (3, 16, 16, 2)
    assert out["ClassVectorsHead"].shape == (3, 2)
    np.testing.assert_allclose(out["ClassVectorsHead"].sum(axis=-1), 1.0, rtol=1e-5)


def test_find_head():
    outs = {"MultiInstanceConfmapsHead": 1, "PartAffinityFieldsHead": 2,
            "MultiInstanceConfmapsHead_stack0": 3}
    assert find_head(outs, "MultiInstanceConfmapsHead") == "MultiInstanceConfmapsHead"
    assert find_head(outs, "PartAffinityFields") == "PartAffinityFieldsHead"
    assert find_head(outs, "ClassMaps") is None


def test_keras_h5_weight_loading():
    import os

    d = "/root/reference/tests/data/models/minimal_instance.UNet.centroid"
    if not os.path.exists(d):
        pytest.skip("reference fixture unavailable")
    from sleap_tpu.io.keras_h5 import load_keras_weights_into_variables

    c = cfg.load_config(d)
    model = Model.from_config(c.model, skeleton=c.data.labels.skeletons[0])
    module, variables = model.init(jax.random.PRNGKey(0), (192, 192, 1))
    loaded = load_keras_weights_into_variables(d + "/best_model.h5", variables)
    # All leaves replaced with matching shapes, outputs finite.
    out = module.apply(loaded, jnp.zeros((1, 192, 192, 1)), train=False)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in out.values())


def test_hrnet_output_shapes():
    from sleap_tpu.models.hrnet import HigherHRNet

    model = Model(
        backbone=HigherHRNet(C=8, stem_filters=8, deconv_filters=16),
        heads=[
            MultiInstanceConfmapsHead(part_names=["a", "b"], output_stride=2),
            PartAffinityFieldsHead(edges=[("a", "b")], output_stride=2),
        ],
    )
    assert model.maximum_stride == 32
    assert model.output_stride == 2
    module, variables = model.init(jax.random.PRNGKey(0), (64, 64, 1))
    out = module.apply(variables, jnp.zeros((2, 64, 64, 1)), train=False)
    assert out["MultiInstanceConfmapsHead"].shape == (2, 32, 32, 2)
    assert out["PartAffinityFieldsHead"].shape == (2, 32, 32, 2)
    assert "batch_stats" in variables


def test_hrnet_head_at_trunk_stride():
    """A head whose stride matches the trunk (pre-deconv) attaches there."""
    from sleap_tpu.models.hrnet import HigherHRNet

    model = Model(
        backbone=HigherHRNet(C=8, stem_filters=8, deconv_filters=16),
        heads=[
            MultiInstanceConfmapsHead(part_names=["a"], output_stride=2),
            CentroidConfmapsHead(output_stride=4),
        ],
    )
    module, variables = model.init(jax.random.PRNGKey(0), (64, 64, 1))
    out = module.apply(variables, jnp.zeros((1, 64, 64, 1)), train=False)
    assert out["MultiInstanceConfmapsHead"].shape == (1, 32, 32, 1)
    assert out["CentroidConfmapsHead"].shape == (1, 16, 16, 1)


def test_hrnet32_param_count():
    """Reference claims HRNet32 has ~30M params (hrnet.py:581)."""
    from sleap_tpu.models.hrnet import HigherHRNet

    model = Model(
        backbone=HigherHRNet(C=32),
        heads=[MultiInstanceConfmapsHead(part_names=["a"], output_stride=2)],
    )
    module = model.make_flax_module()
    shapes = jax.eval_shape(
        lambda rng, x: module.init(rng, x, train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 64, 64, 1), jnp.float32),
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))
    assert 25e6 < n < 35e6


def test_hrnet_from_config_roundtrip(tmp_path):
    import sleap_tpu.config as C

    c = C.TrainingJobConfig()
    c.model.backbone.hrnet = C.HRNetConfig(C=8)
    p = str(tmp_path / "cfg.json")
    c.save_json(p)
    c2 = C.load_config(p)
    assert c2.model.backbone.hrnet.C == 8
    assert c2.model.backbone.which_oneof_attrib_name == "hrnet"


def test_unet_space_to_depth():
    """TPU-native s2d stem: strides account for the pixel-shuffle factor."""
    from sleap_tpu.models.encoder_decoder import space_to_depth

    x = jnp.arange(2 * 8 * 8 * 3).reshape(2, 8, 8, 3).astype(jnp.float32)
    y = space_to_depth(x, 2)
    assert y.shape == (2, 4, 4, 12)
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0, :3]), np.asarray(x[0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0, 3:6]), np.asarray(x[0, 0, 1]))

    c = cfg.ModelConfig(
        backbone=cfg.BackboneConfig(
            unet=cfg.UNetConfig(
                max_stride=16, output_stride=4, filters=16, space_to_depth=4
            )
        ),
        heads=cfg.HeadsConfig(centroid=cfg.CentroidsHeadConfig(output_stride=4)),
    )
    model = Model.from_config(c)
    assert model.maximum_stride == 16
    assert model.output_stride == 4
    module, variables = model.init(jax.random.PRNGKey(0), (64, 64, 1))
    out = module.apply(variables, jnp.zeros((2, 64, 64, 1)), train=False)
    assert out["CentroidConfmapsHead"].shape == (2, 16, 16, 1)

    # Gradients flow through the shuffle.
    def loss(p):
        o = module.apply({"params": p}, jnp.ones((1, 64, 64, 1)) * 0.5, train=True)
        return sum(v.sum() for v in o.values())

    g = jax.grad(loss)(variables["params"])
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))


def test_fused_up2_conv_exact_vs_unfused():
    """fused_up2_conv == conv_SAME(bilinear_up2(x), W) including borders."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sleap_tpu.models.encoder_decoder import fused_up2_conv

    rng = np.random.default_rng(0)
    with jax.default_matmul_precision("highest"):
        for N, M, C, CO in [(6, 8, 3, 5), (4, 4, 1, 1), (8, 6, 2, 4)]:
            x = jnp.asarray(rng.normal(size=(2, N, M, C)).astype("f4"))
            W = jnp.asarray(rng.normal(size=(3, 3, C, CO)).astype("f4"))
            up = jax.image.resize(x, (2, 2 * N, 2 * M, C), method="bilinear")
            ref = jax.lax.conv_general_dilated(
                up, W, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            got = fused_up2_conv(x, W)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
            )
            # Alternative interior-conv forms (same math, different XLA
            # lowering): explicit subpixel phase conv + d2s, and H-dilated
            # with W phases in channels + free interleave reshape.
            for variant in ("phase", "hdil"):
                got_v = fused_up2_conv(x, W, variant=variant)
                np.testing.assert_allclose(
                    np.asarray(got_v), np.asarray(ref), rtol=1e-4, atol=1e-5,
                    err_msg=variant,
                )
