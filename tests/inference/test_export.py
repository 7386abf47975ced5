"""StableHLO model export / reload (reference frozen-graph export tests,
tests/nn/test_inference.py:1188-1463)."""

import json
import os

import numpy as np
import pytest

MODELS = "/root/reference/tests/data/models"


def _require(path):
    if not os.path.exists(path):
        pytest.skip(f"reference fixture unavailable: {path}")
    return path


@pytest.mark.slow
def test_export_and_reload_roundtrip(tmp_path):
    model = _require(os.path.join(MODELS, "minimal_instance.UNet.bottomup"))
    save_path = str(tmp_path / "exported")

    from sleap_tpu.inference.export import export_model, load_exported_model

    out = export_model(model, save_path=save_path, batch_size=2, image_size=128)
    assert os.path.exists(os.path.join(out, "model.stablehlo"))
    info = json.load(open(os.path.join(out, "info.json")))
    assert info["input_shape"] == [2, 128, 128, 1]
    assert info["predictor"] == "BottomUpPredictor"

    fn = load_exported_model(out)
    x = np.random.randint(0, 255, (2, 128, 128, 1), np.uint8)
    result = fn(x)
    # NaN-padded static-shape output dict (the predictor's on-chip contract;
    # bottom-up now returns fully assembled instances).
    keys = ("instances", "peaks", "instance_peaks")
    leaf = next(result[k] for k in keys if k in result)
    assert np.asarray(leaf).shape[0] == 2


@pytest.mark.slow
def test_sleap_export_cli(tmp_path, capsys):
    model = _require(os.path.join(MODELS, "minimal_robot.UNet.single_instance"))
    save_path = str(tmp_path / "cli_exported")

    from sleap_tpu.cli.export import main

    main(["-m", model, "-e", save_path, "--batch_size", "1", "--image_size", "96"])
    assert "Exported to:" in capsys.readouterr().out
    assert os.path.exists(os.path.join(save_path, "model.stablehlo"))


def test_predictor_export_model_method(tmp_path):
    """Predictor.export_model exports the live predictor (reference
    inference.py:533) and the artifact round-trips."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sleap_tpu.config import (
        BackboneConfig,
        HeadsConfig,
        ModelConfig,
        SingleInstanceConfmapsHeadConfig,
        TrainingJobConfig,
        UNetConfig,
    )
    from sleap_tpu.inference.export import load_exported_model
    from sleap_tpu.inference.predictors import (
        SingleInstancePredictor,
        TrainedModel,
    )
    from sleap_tpu.models.model import Model

    cfg_m = ModelConfig(
        backbone=BackboneConfig(
            unet=UNetConfig(max_stride=8, output_stride=4, filters=4)
        ),
        heads=HeadsConfig(
            single_instance=SingleInstanceConfmapsHeadConfig(
                part_names=["a", "b"], output_stride=4
            )
        ),
    )
    model = Model.from_config(cfg_m)
    module = model.make_flax_module()
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), train=False
    )
    pred = SingleInstancePredictor(
        confmap_model=TrainedModel(
            config=TrainingJobConfig(model=cfg_m), model=model, module=module,
            variables=variables, input_channels=1,
        ),
        batch_size=2,
    )
    out = pred.export_model(str(tmp_path / "exp"), image_size=64)
    fn = load_exported_model(out)
    res = fn(np.zeros((2, 64, 64, 1), np.uint8))
    assert res["instance_peaks"].shape[0] == 2
