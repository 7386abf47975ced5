"""Parity of the folded s2d stem vs the materialized space-to-depth path.

The fold rewrites every 3x3 SAME conv over the s2d stem map — the first
encoder conv and the last decoder skip-concat part — as an equivalent
(3f)x(3f) stride-f conv on the raw image (encoder_decoder.fold_s2d_kernel),
so the 6-D s2d transpose never materializes. Same parameter tree, same math
up to float reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleap_tpu.config import (
    BackboneConfig,
    HeadsConfig,
    ModelConfig,
    MultiInstanceConfig,
    MultiInstanceConfmapsHeadConfig,
    PartAffinityFieldsHeadConfig,
    UNetConfig,
)
from sleap_tpu.models.encoder_decoder import (
    _VirtualS2D,
    conv_over_s2d,
    fold_s2d_kernel,
    space_to_depth,
)
from sleap_tpu.models.model import Model


def test_fold_s2d_kernel_conv_equivalence():
    """Folded stride-f conv on raw == SAME conv on the s2d map, exactly."""
    rng = np.random.RandomState(0)
    for f, c, kh in [(4, 1, 3), (2, 3, 3), (4, 1, 5)]:
        x = jnp.asarray(rng.randn(2, 16 * f, 8 * f, c), jnp.float32)
        kernel = jnp.asarray(rng.randn(kh, kh, f * f * c, 7), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            space_to_depth(x, f), kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = conv_over_s2d(_VirtualS2D(x, f), kernel)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fold_s2d_kernel_shape():
    k = jnp.zeros((3, 3, 16, 64))
    assert fold_s2d_kernel(k, 4).shape == (12, 12, 1, 64)
    k = jnp.zeros((3, 3, 12, 8))
    assert fold_s2d_kernel(k, 2).shape == (6, 6, 3, 8)


def _bottomup_model():
    cfg = ModelConfig()
    cfg.backbone = BackboneConfig(
        unet=UNetConfig(
            max_stride=16, output_stride=4, filters=16, filters_rate=2.0,
            up_interpolate=True, space_to_depth=4,
        )
    )
    cfg.heads = HeadsConfig(
        multi_instance=MultiInstanceConfig(
            confmaps=MultiInstanceConfmapsHeadConfig(
                part_names=["a", "b", "c"], output_stride=4, sigma=2.5
            ),
            pafs=PartAffinityFieldsHeadConfig(
                edges=[("a", "b"), ("b", "c")], output_stride=8, sigma=5.0
            ),
        )
    )
    return Model.from_config(cfg)


@pytest.mark.parametrize("dtype", ["float32"])
def test_fold_stem_full_model_parity(dtype):
    """Bottom-up flagship shape (scaled down): folded == unfolded outputs."""
    model = _bottomup_model()
    module, variables = model.init(jax.random.PRNGKey(0), (256, 256, 1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 256, 256, 1))

    base = module.clone(fold_s2d_stem=False).apply(variables, x, train=False)
    fold = module.clone(fold_s2d_stem=True).apply(variables, x, train=False)
    assert set(base) == set(fold)
    for k in base:
        np.testing.assert_allclose(
            np.asarray(fold[k]), np.asarray(base[k]), atol=2e-4,
            err_msg=f"output {k} diverges under stem fold",
        )


def test_fold_stem_fused_up_path_parity():
    """At >=64^2 pre-upsample maps the decoder takes _FusedUpSplitConv; its
    skip part must also consume the virtual s2d map folded."""
    cfg = ModelConfig()
    cfg.backbone = BackboneConfig(
        unet=UNetConfig(
            max_stride=8, output_stride=4, filters=4, filters_rate=1.5,
            up_interpolate=True, space_to_depth=4,
        )
    )
    cfg.heads = HeadsConfig(
        multi_instance=MultiInstanceConfig(
            confmaps=MultiInstanceConfmapsHeadConfig(
                part_names=["a", "b"], output_stride=4, sigma=2.5
            ),
            pafs=PartAffinityFieldsHeadConfig(
                edges=[("a", "b")], output_stride=8, sigma=5.0
            ),
        )
    )
    model = Model.from_config(cfg)
    module, variables = model.init(jax.random.PRNGKey(0), (512, 512, 1))
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 512, 512, 1))
    base = module.clone(fold_s2d_stem=False).apply(variables, x, train=False)
    fold = module.clone(fold_s2d_stem=True).apply(variables, x, train=False)
    for k in base:
        np.testing.assert_allclose(
            np.asarray(fold[k]), np.asarray(base[k]), atol=2e-4,
            err_msg=f"output {k} diverges under stem fold (fused path)",
        )


def test_fold_stem_param_tree_identical():
    """The fold is a pure runtime flag: init under either produces the same
    parameter tree (names and shapes), so checkpoints are interchangeable."""
    model = _bottomup_model()
    module, _ = model.init(jax.random.PRNGKey(0), (128, 128, 1))
    x = jnp.zeros((1, 128, 128, 1))
    v0 = module.clone(fold_s2d_stem=False).init(jax.random.PRNGKey(2), x)
    v1 = module.clone(fold_s2d_stem=True).init(jax.random.PRNGKey(2), x)
    t0 = jax.tree_util.tree_map(lambda a: a.shape, v0)
    t1 = jax.tree_util.tree_map(lambda a: a.shape, v1)
    assert t0 == t1
    # Identical RNG -> identical initial values too (same init distributions).
    leaves0 = jax.tree_util.tree_leaves(v0)
    leaves1 = jax.tree_util.tree_leaves(v1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_fold_stem_gradients_match():
    """Training under the fold is equivalent: grads match the unfolded path."""
    model = _bottomup_model()
    module, variables = model.init(jax.random.PRNGKey(0), (128, 128, 1))
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 128, 128, 1))

    def loss(params, fold):
        out = module.clone(fold_s2d_stem=fold).apply(
            {"params": params}, x, train=False
        )
        return sum(jnp.sum(v**2) for v in out.values())

    g0 = jax.grad(loss)(variables["params"], False)
    g1 = jax.grad(loss)(variables["params"], True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3
        ),
        g0,
        g1,
    )


def test_fold_flag_via_unet_config():
    """UNetConfig.fold_s2d_stem threads through Model.from_config to the
    module; outputs match the unfolded path."""
    cfg = ModelConfig()
    cfg.backbone = BackboneConfig(
        unet=UNetConfig(
            max_stride=16, output_stride=4, filters=8, filters_rate=2.0,
            up_interpolate=True, space_to_depth=4, fold_s2d_stem=True,
        )
    )
    cfg.heads = HeadsConfig(
        multi_instance=MultiInstanceConfig(
            confmaps=MultiInstanceConfmapsHeadConfig(
                part_names=["a", "b"], output_stride=4, sigma=2.5
            ),
            pafs=PartAffinityFieldsHeadConfig(
                edges=[("a", "b")], output_stride=8, sigma=5.0
            ),
        )
    )
    module, variables = Model.from_config(cfg).init(
        jax.random.PRNGKey(0), (128, 128, 1)
    )
    assert module.fold_s2d_stem is True
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 1))
    base = module.clone(fold_s2d_stem=False).apply(variables, x, train=False)
    fold = module.apply(variables, x, train=False)
    for k in base:
        np.testing.assert_allclose(
            np.asarray(fold[k]), np.asarray(base[k]), atol=2e-4
        )


def test_fold_stem_bf16_parity():
    """The production inference config runs bf16; fold must match unfolded
    bf16 within bf16 tolerance."""
    import jax.numpy as jnp

    model = _bottomup_model()
    module, variables = model.init(jax.random.PRNGKey(0), (256, 256, 1))
    bf16 = module.clone(compute_dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 256, 256, 1))
    base = bf16.clone(fold_s2d_stem=False).apply(variables, x, train=False)
    fold = bf16.clone(fold_s2d_stem=True).apply(variables, x, train=False)
    for k in base:
        np.testing.assert_allclose(
            np.asarray(fold[k], np.float32),
            np.asarray(base[k], np.float32),
            atol=3e-2,
            err_msg=f"output {k} diverges under bf16 stem fold",
        )
