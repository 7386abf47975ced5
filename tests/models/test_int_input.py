"""Integer (raw uint8) model inputs: in-graph normalization parity.

``EncoderDecoderNet`` accepts integer images and normalizes them to [0, 1]
in-graph (``ensure_float`` semantics, reference
``sleap/nn/data/normalization.py``). With a space-to-depth stem the
normalize is deferred until after the stem, so the big transpose moves
1-byte elements — s2d is pure data movement, so the result must be
bit-identical to pre-normalized float input.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sleap_tpu.config import (
    BackboneConfig,
    HeadsConfig,
    ModelConfig,
    MultiInstanceConfig,
    MultiInstanceConfmapsHeadConfig,
    PartAffinityFieldsHeadConfig,
    SingleInstanceConfmapsHeadConfig,
    UNetConfig,
)
from sleap_tpu.data.normalization import ensure_float
from sleap_tpu.inference.predictors import _preprocess
from sleap_tpu.models.model import Model


def _model(space_to_depth=4, max_stride=16):
    cfg = ModelConfig()
    cfg.backbone = BackboneConfig(
        unet=UNetConfig(
            max_stride=max_stride, output_stride=4, filters=8,
            filters_rate=2.0, up_interpolate=True,
            space_to_depth=space_to_depth,
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


def _uint8_batch(hw=128):
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (2, hw, hw, 1)).astype(np.uint8)


def _assert_bitexact(module, variables, x_u8):
    out_int = module.apply(variables, jnp.asarray(x_u8), train=False)
    out_flt = module.apply(variables, ensure_float(jnp.asarray(x_u8)), train=False)
    assert set(out_int) == set(out_flt)
    for k in out_int:
        np.testing.assert_array_equal(
            np.asarray(out_int[k]), np.asarray(out_flt[k]),
            err_msg=f"output {k} diverges for integer input",
        )


def test_uint8_input_s2d_stem_bitexact():
    model = _model(space_to_depth=4)
    module, variables = model.init(jax.random.PRNGKey(0), (128, 128, 1))
    _assert_bitexact(module, variables, _uint8_batch())


def test_uint8_input_no_s2d_bitexact():
    """Without an s2d stem the normalize happens up front; still exact."""
    model = _model(space_to_depth=1, max_stride=8)
    module, variables = model.init(jax.random.PRNGKey(0), (128, 128, 1))
    _assert_bitexact(module, variables, _uint8_batch())


def test_uint8_input_folded_stem_bitexact():
    """fold_s2d_stem consumes the raw map directly; integer inputs are
    normalized up front on that path (the fold needs float pixels)."""
    model = _model(space_to_depth=4)
    module, variables = model.init(jax.random.PRNGKey(0), (128, 128, 1))
    module = module.clone(fold_s2d_stem=True)
    _assert_bitexact(module, variables, _uint8_batch())


def test_uint8_input_bf16_matches_float_path():
    """bf16 compute: the deferred normalize rounds identically to the eager
    ensure_float path (both compute f32(x)/255 then cast to bf16)."""
    model = _model(space_to_depth=4)
    module, variables = model.init(jax.random.PRNGKey(0), (128, 128, 1))
    module = module.clone(compute_dtype=jnp.bfloat16)
    _assert_bitexact(module, variables, _uint8_batch())


def test_preprocess_defer_float_keeps_uint8():
    x = jnp.asarray(_uint8_batch(64))
    out = _preprocess(x, grayscale=True, input_scale=1.0, pad_stride=16,
                      defer_float=True)
    assert out.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_preprocess_defer_float_falls_back_on_resize():
    x = jnp.asarray(_uint8_batch(64))
    out = _preprocess(x, grayscale=True, input_scale=0.5, pad_stride=16,
                      defer_float=True)
    assert jnp.issubdtype(out.dtype, jnp.floating)
    ref = _preprocess(x, grayscale=True, input_scale=0.5, pad_stride=16,
                      defer_float=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
