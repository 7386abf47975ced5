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
