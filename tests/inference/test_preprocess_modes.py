"""Integer normalization scale + imagenet_mode threading (round-4 ADVICE).

Reference semantics: ``ensure_float`` uses ``tf.image.convert_image_dtype``
(/root/reference/sleap/nn/data/normalization.py:229-246) which divides by the
SOURCE dtype max (uint8 /255, uint16 /65535), and predictors must apply the
model's ``data.preprocessing.imagenet_mode`` at inference
(/root/reference/sleap/nn/data/normalization.py:319,345-370).
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_ensure_float_scales_by_dtype_max():
    from sleap_tpu.data.normalization import ensure_float

    u16 = jnp.full((2, 4, 4, 1), 32768, jnp.uint16)
    f = ensure_float(u16)
    assert f.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(f), 32768 / 65535.0, rtol=1e-6)
    u8 = jnp.full((2, 4, 4, 1), 128, jnp.uint8)
    np.testing.assert_allclose(np.asarray(ensure_float(u8)), 128 / 255.0, rtol=1e-6)


def test_deferred_normalize_matches_ensure_float_uint16():
    """The in-graph integer path divides by the dtype max too, keeping
    deferred and eager normalization bit-identical for non-uint8 ints."""
    from sleap_tpu.config import (
        BackboneConfig, HeadsConfig, ModelConfig,
        SingleInstanceConfmapsHeadConfig, UNetConfig,
    )
    from sleap_tpu.data.normalization import ensure_float
    from sleap_tpu.models.model import Model

    cfg = ModelConfig(
        backbone=BackboneConfig(
            unet=UNetConfig(
                max_stride=8, output_stride=4, filters=8, filters_rate=2.0,
                up_interpolate=True, space_to_depth=2,
            )
        ),
        heads=HeadsConfig(
            single_instance=SingleInstanceConfmapsHeadConfig(
                part_names=["a", "b"], output_stride=4, sigma=2.5
            )
        ),
    )
    model = Model.from_config(cfg)
    module = model.make_flax_module()
    x16 = jax.random.randint(
        jax.random.PRNGKey(0), (1, 32, 32, 1), 0, 65535, jnp.int32
    ).astype(jnp.uint16)
    variables = module.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)), train=False)
    out_int = module.apply(variables, x16, train=False)
    out_f = module.apply(variables, ensure_float(x16), train=False)
    for k in out_f:
        np.testing.assert_allclose(
            np.asarray(out_int[k]), np.asarray(out_f[k]), atol=1e-6
        )


def _tiny_single_predictor(imagenet_mode=None):
    from sleap_tpu.config import (
        BackboneConfig, DataConfig, HeadsConfig, ModelConfig,
        PreprocessingConfig, SingleInstanceConfmapsHeadConfig,
        TrainingJobConfig, UNetConfig,
    )
    from sleap_tpu.inference.predictors import SingleInstancePredictor, TrainedModel
    from sleap_tpu.models.model import Model

    model_cfg = ModelConfig(
        backbone=BackboneConfig(
            unet=UNetConfig(
                max_stride=8, output_stride=4, filters=8, filters_rate=2.0,
                up_interpolate=True,
            )
        ),
        heads=HeadsConfig(
            single_instance=SingleInstanceConfmapsHeadConfig(
                part_names=["a", "b"], output_stride=4, sigma=2.5
            )
        ),
    )
    cfg = TrainingJobConfig(
        model=model_cfg,
        data=DataConfig(
            preprocessing=PreprocessingConfig(
                pad_to_stride=8, ensure_rgb=True, imagenet_mode=imagenet_mode
            )
        ),
    )
    model = Model.from_config(model_cfg)
    module = model.make_flax_module()
    variables = module.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)), train=False)
    return SingleInstancePredictor(
        confmap_model=TrainedModel(
            config=cfg, model=model, module=module, variables=variables,
            input_channels=3,
        ),
        batch_size=1,
    )


def test_predictor_applies_imagenet_mode():
    """A model trained with imagenet_mode must get the transform at
    inference: identical weights + input, different preprocessing => the
    confidence maps must differ (the round-3 gap was the guard existing but
    no call site threading the mode through)."""
    imgs = jax.random.randint(
        jax.random.PRNGKey(4), (1, 32, 32, 3), 0, 255, jnp.int32
    ).astype(jnp.uint8)
    outs = {}
    for mode in (None, "torch"):
        pred = _tiny_single_predictor(imagenet_mode=mode)
        infer = pred._build_infer_fn().__wrapped__
        outs[mode] = np.asarray(infer(imgs)["instance_peak_vals"])
    assert not np.allclose(outs[None], outs["torch"], atol=1e-5)


def test_imagenet_mode_matches_eager_transform():
    """The jitted predictor path reproduces ensure_float + apply_imagenet_mode
    exactly (no deferred-integer shortcut may skip the transform)."""
    from sleap_tpu.data.normalization import apply_imagenet_mode, ensure_float
    from sleap_tpu.ops.peak_finding import find_global_peaks

    imgs = jax.random.randint(
        jax.random.PRNGKey(5), (1, 32, 32, 3), 0, 255, jnp.int32
    ).astype(jnp.uint8)
    pred = _tiny_single_predictor(imagenet_mode="tf")
    tm = pred.confmap_model
    head_cfg = tm.config.model.heads.single_instance
    infer = pred._build_infer_fn().__wrapped__
    out = infer(imgs)
    ref_in = apply_imagenet_mode(ensure_float(imgs), "tf")
    cms = tm.module.apply(tm.variables, ref_in, train=False)[
        "SingleInstanceConfmapsHead"
    ]
    peaks, vals = find_global_peaks(
        cms, threshold=pred.peak_threshold, refinement="integral",
        integral_patch_size=pred.integral_patch_size,
    )
    np.testing.assert_allclose(
        np.asarray(out["instance_peaks"]),
        np.asarray(peaks) * head_cfg.output_stride,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["instance_peak_vals"]), np.asarray(vals), atol=1e-6
    )
