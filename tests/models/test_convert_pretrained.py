"""Tests for the torchvision -> npz pretrained-weight converter.

Reference behavior being replaced: segmentation_models downloads ImageNet
weights at build time (/root/reference/sleap/nn/architectures/
pretrained_encoders.py:219). Here: synthetic source checkpoints in the
torchvision layout -> convert -> load through the real ``pretrained=True``
path -> assert every encoder tensor landed (values + layout).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sleap_tpu.models import convert_pretrained as cp
from sleap_tpu.models.pretrained_encoder import (
    UnetPretrainedEncoder,
    UnetPretrainedEncoderModule,
    load_local_encoder_weights,
)


def synth_state_dict(encoder, rng):
    """Fake torchvision checkpoint: right keys, right shapes, random values.

    Shapes come from the flax module's own variable tree run through the
    inverse layout transform (flax HWIO -> torch OIHW), so every converted
    array must round-trip exactly.
    """
    import flax

    module = UnetPretrainedEncoderModule(encoder=encoder, decoder_filters=(8, 8))
    variables = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    )
    flat = {
        "/".join(k[1:]): v.shape
        for k, v in flax.traverse_util.flatten_dict(variables).items()
    }
    sd = {}
    for flax_name, torch_key, transform in cp._MAPPERS[encoder]():
        shape = flat[flax_name]
        if transform is cp._conv_t:
            # flax (kh, kw, ci, co) -> torch (co, ci, kh, kw)
            shape = (shape[3], shape[2], shape[0], shape[1])
        sd[torch_key] = rng.standard_normal(shape).astype(np.float32)
    return sd


@pytest.mark.parametrize(
    "encoder",
    ["resnet18", "resnet50", "vgg16", "mobilenetv2", "densenet121",
     "efficientnetb0", "resnext50", "vgg19", "densenet169", "efficientnetb2",
     "resnet101"],
)
def test_convert_roundtrip(encoder, tmp_path, monkeypatch):
    rng = np.random.default_rng(7)
    sd = synth_state_dict(encoder, rng)
    arrays = cp.convert_torchvision_state_dict(sd, encoder)
    np.savez(tmp_path / f"{encoder}.npz", **arrays)

    # Load through the REAL pretrained=True path (env-dir lookup + hook).
    monkeypatch.setenv("SLEAP_TPU_PRETRAINED_DIR", str(tmp_path))
    desc = UnetPretrainedEncoder(encoder=encoder, decoder_filters=(8, 8), pretrained=True)
    module = UnetPretrainedEncoderModule(encoder=encoder, decoder_filters=(8, 8))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    # The hook sees model-level paths (backbone_module/...): emulate by
    # nesting, exactly like BackboneWithHeads does.
    import flax

    nested = {
        coll: {"backbone_module": tree} for coll, tree in variables.items()
    }
    loaded = desc.init_weights_hook(nested)

    flat = flax.traverse_util.flatten_dict(loaded)
    n_checked = 0
    for flax_name, torch_key, transform in cp._MAPPERS[encoder]():
        parts = flax_name.split("/")
        coll = "batch_stats" if parts[-1] in ("mean", "var") else "params"
        got = np.asarray(flat[(coll, "backbone_module", *parts)])
        src = sd[torch_key]
        want = transform(src) if transform is not None else src
        np.testing.assert_array_equal(got, want.astype(got.dtype))
        n_checked += 1
    assert n_checked == len(cp._MAPPERS[encoder]())


def test_expected_torchvision_key_names():
    """Pin a few well-known torchvision state_dict keys so the mapping can't
    silently drift from the real checkpoints' naming."""
    known = {
        "resnet18": ["conv1.weight", "bn1.running_mean", "layer1.0.conv1.weight",
                     "layer2.0.downsample.0.weight", "layer4.1.bn2.running_var"],
        "resnet50": ["layer1.0.conv3.weight", "layer1.0.downsample.1.weight",
                     "layer3.5.bn3.bias"],
        "vgg16": ["features.0.weight", "features.0.bias", "features.28.weight"],
        "mobilenetv2": ["features.0.0.weight", "features.1.conv.0.0.weight",
                        "features.2.conv.1.0.weight", "features.18.1.running_mean"],
        "densenet121": ["features.conv0.weight",
                        "features.denseblock1.denselayer1.norm1.weight",
                        "features.transition1.conv.weight",
                        "features.norm5.running_var",
                        "features.denseblock4.denselayer16.conv2.weight"],
        "efficientnetb0": ["features.0.0.weight", "features.1.0.block.0.0.weight",
                           "features.2.0.block.0.0.weight",
                           "features.2.0.block.2.fc1.weight",
                           "features.8.0.weight"],
    }
    for encoder, keys in known.items():
        torch_keys = {tk for _, tk, _ in cp._MAPPERS[encoder]()}
        for k in keys:
            assert k in torch_keys, f"{encoder}: expected torchvision key {k}"


def test_missing_keys_fail_loudly():
    with pytest.raises(KeyError, match="expected source keys absent"):
        cp.convert_torchvision_state_dict({"conv1.weight": np.zeros((64, 3, 7, 7))},
                                          "resnet18")


def test_unknown_encoder_rejected():
    with pytest.raises(ValueError, match="Unsupported encoder"):
        cp.convert_torchvision_state_dict({}, "inceptionv3")


def test_op_level_forward_parity_with_torch():
    """Converted conv + BN arrays reproduce torch's functional ops.

    Proves the layout transforms numerically, not just structurally: a flax
    conv with the converted kernel == torch.nn.functional.conv2d with the
    original, and flax BatchNorm inference == F.batch_norm with the original
    weight/bias/running stats.
    """
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)

    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
    got = jax.lax.conv_general_dilated(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(cp._conv_t(w)),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest",
    )
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref,
                               atol=1e-4)

    # BN inference with converted running stats.
    g = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    mean = rng.standard_normal(8).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    y = rng.standard_normal((2, 8, 4, 4)).astype(np.float32)
    ref_bn = F.batch_norm(
        torch.from_numpy(y), torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(g), torch.from_numpy(b), training=False, eps=1e-3,
    ).numpy()
    ynhwc = jnp.asarray(np.transpose(y, (0, 2, 3, 1)))
    got_bn = (ynhwc - mean) / np.sqrt(var + 1e-3) * g + b
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_bn), (0, 3, 1, 2)), ref_bn, atol=1e-5
    )
