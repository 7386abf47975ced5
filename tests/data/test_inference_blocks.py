"""Pipeline-block inference transformers (reference sleap/nn/data/inference.py)."""

import numpy as np

from sleap_tpu.data.inference import (
    GlobalPeakFinder,
    LocalPeakFinder,
    MockGlobalPeakFinder,
    PredictedCenterInstanceNormalizer,
)
from sleap_tpu.ops.confmaps import make_confmaps
from sleap_tpu.ops.grid import make_grid_vectors


def _confmap_example(points, hw=32, sigma=1.5):
    import jax.numpy as jnp

    xv, yv = make_grid_vectors(hw, hw, 1)
    cms = make_confmaps(jnp.asarray(points, "f4"), xv, yv, sigma)
    return np.asarray(cms)


def test_global_peak_finder_block():
    pts = np.array([[10.0, 12.0], [20.0, 7.0]])
    cms = _confmap_example(pts)  # (H, W, 2)
    block = GlobalPeakFinder(confmaps_key="cms", peaks_key="pts", peak_vals_key="vals")
    assert block.input_keys == ["cms"]
    assert set(block.output_keys) == {"pts", "vals", "cms"}
    (out,) = list(block.transform_dataset([{"cms": cms}]))
    np.testing.assert_allclose(out["pts"], pts, atol=0.2)
    assert (out["vals"] > 0.9).all()
    assert "cms" in out  # keep_confmaps default


def test_global_peak_finder_stride_and_drop():
    pts = np.array([[8.0, 4.0]])
    cms = _confmap_example(pts, hw=16)
    block = GlobalPeakFinder(
        confmaps_key="cms", peaks_key="p", peak_vals_key="v",
        confmaps_stride=4, keep_confmaps=False, integral=False,
    )
    (out,) = list(block.transform_dataset([{"cms": cms}]))
    np.testing.assert_allclose(out["p"], pts * 4, atol=2.0)
    assert "cms" not in out


def test_local_peak_finder_block():
    pts1 = np.array([[5.0, 6.0]])
    pts2 = np.array([[20.0, 22.0]])
    import jax.numpy as jnp

    xv, yv = make_grid_vectors(32, 32, 1)
    cms = np.maximum(
        _confmap_example(pts1), _confmap_example(pts2)
    )  # two blobs, one channel
    block = LocalPeakFinder(confmaps_key="cms", peak_threshold=0.3)
    (out,) = list(block.transform_dataset([{"cms": cms}]))
    got = out["predicted_centroids"]
    assert got.shape[0] == 2
    order = np.argsort(got[:, 0])
    np.testing.assert_allclose(got[order], [[5, 6], [20, 22]], atol=0.2)
    assert (out["predicted_centroid_sample_inds"] == 0).all()
    assert (out["predicted_centroid_channel_inds"] == 0).all()


def test_mock_global_peak_finder_block():
    instances = np.array(
        [[[10.0, 10.0], [12.0, 12.0]], [[30.0, 30.0], [32.0, 32.0]]]
    )
    ex = {
        "instances": instances,
        "centroid": np.array([11.0, 11.0]),
        "bbox": np.array([8.0, 9.0, 24.0, 25.0]),  # (y1, x1, y2, x2)
        "scale": np.array([1.0, 1.0]),
        "instance_confidence_maps": np.zeros((4, 4, 2), "f4"),
    }
    block = MockGlobalPeakFinder()
    (out,) = list(block.transform_dataset([ex]))
    # Nearest instance is the first; coordinates shifted by (x1, y1).
    np.testing.assert_allclose(
        out["predicted_center_instance_points"], instances[0] - [9.0, 8.0]
    )
    assert (out["predicted_center_instance_confidences"] == 1).all()
    assert "instances" not in out
    assert "predicted_instance_confidence_maps" in out


def test_predicted_center_instance_normalizer():
    ex = {
        "centroid": np.array([20.0, 30.0]),
        "centroid_confidence": np.array(0.9),
        "predicted_center_instance_points": np.array([[1.0, 2.0], [3.0, 4.0]]),
        "predicted_center_instance_confidences": np.array([0.5, 0.6]),
        "scale": np.array([2.0, 2.0]),
        "bbox": np.array([10.0, 12.0, 42.0, 44.0]),
    }
    block = PredictedCenterInstanceNormalizer()
    (out,) = list(block.transform_dataset([ex]))
    np.testing.assert_allclose(out["predicted_centroid"], [10.0, 15.0])
    # pts + (x1, y1), then / scale.
    np.testing.assert_allclose(
        out["predicted_instance"], (np.array([[1, 2], [3, 4]]) + [12, 10]) / 2.0
    )
    np.testing.assert_allclose(out["predicted_instance_confidences"], [0.5, 0.6])


def test_model_predictor_block():
    """ModelPredictor runs a real tiny trained model over examples."""
    import jax

    from sleap_tpu import config as cfg
    from sleap_tpu.data.inference import ModelPredictor
    from sleap_tpu.inference.predictors import TrainedModel
    from sleap_tpu.models.model import Model

    model_cfg = cfg.ModelConfig(
        backbone=cfg.BackboneConfig(
            unet=cfg.UNetConfig(max_stride=4, output_stride=2, filters=4)
        ),
        heads=cfg.HeadsConfig(
            centered_instance=cfg.CenteredInstanceConfmapsHeadConfig(
                part_names=["a", "b"], output_stride=2
            )
        ),
    )
    model = Model.from_config(model_cfg)
    module = model.make_flax_module()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 16, 16, 1), "f4"), train=False
    )
    tm = TrainedModel(
        config=cfg.TrainingJobConfig(model=model_cfg),
        model=model, module=module, variables=variables, input_channels=1,
    )
    block = ModelPredictor(model=tm, model_input_keys="img", model_output_keys="cms")
    ex = {"img": np.zeros((16, 16, 1), np.uint8)}
    (out,) = list(block.transform_dataset([ex]))
    assert out["cms"].shape == (8, 8, 2)
