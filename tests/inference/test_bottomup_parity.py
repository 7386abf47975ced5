"""Bottom-up parity against reference saved predictions."""

import os

import numpy as np
import pytest

MODELS = "/root/reference/tests/data/models"


@pytest.mark.slow
def test_bottomup_parity():
    d = os.path.join(MODELS, "minimal_instance.UNet.bottomup")
    if not os.path.isdir(d):
        pytest.skip("reference fixture unavailable")
    import sleap_tpu
    from sleap_tpu.inference.bottomup import BottomUpPredictor

    gt = sleap_tpu.load_file(d + "/labels_gt.val.slp")
    ref = sleap_tpu.load_file(d + "/labels_pr.val.slp")
    pred = BottomUpPredictor.from_trained_models(d, max_peaks_per_node=8)
    ours = pred.predict(gt)
    assert len(ours) == len(ref)
    for lf_r, lf_o in zip(ref.labeled_frames, ours.labeled_frames):
        a = np.array(sorted([i.numpy().tolist() for i in lf_r.predicted_instances]))
        b = np.array(sorted([i.numpy().tolist() for i in lf_o.predicted_instances]))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-3)
        sa = sorted([i.score for i in lf_r.predicted_instances])
        sb = sorted([i.score for i in lf_o.predicted_instances])
        np.testing.assert_allclose(sa, sb, rtol=1e-4)


def _tiny_bottomup_predictor(dtype=None):
    import jax
    import jax.numpy as jnp

    from sleap_tpu.config import (
        BackboneConfig,
        DataConfig,
        HeadsConfig,
        ModelConfig,
        MultiInstanceConfig,
        MultiInstanceConfmapsHeadConfig,
        PartAffinityFieldsHeadConfig,
        PreprocessingConfig,
        TrainingJobConfig,
        UNetConfig,
    )
    from sleap_tpu.inference.bottomup import BottomUpPredictor
    from sleap_tpu.inference.predictors import TrainedModel
    from sleap_tpu.models.model import Model

    parts = [f"n{i}" for i in range(3)]
    model_cfg = ModelConfig(
        backbone=BackboneConfig(
            unet=UNetConfig(
                max_stride=8, output_stride=4, filters=8, filters_rate=2.0,
                up_interpolate=True,
            )
        ),
        heads=HeadsConfig(
            multi_instance=MultiInstanceConfig(
                confmaps=MultiInstanceConfmapsHeadConfig(
                    part_names=parts, output_stride=4, sigma=2.5
                ),
                pafs=PartAffinityFieldsHeadConfig(
                    edges=[[parts[i], parts[i + 1]] for i in range(2)],
                    output_stride=8, sigma=5.0,
                ),
            )
        ),
    )
    cfg = TrainingJobConfig(
        model=model_cfg,
        data=DataConfig(preprocessing=PreprocessingConfig(pad_to_stride=8)),
    )
    model = Model.from_config(model_cfg)
    module = model.make_flax_module(
        **({"compute_dtype": dtype} if dtype is not None else {})
    )
    variables = module.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 1)), train=False
    )
    return BottomUpPredictor(
        bottomup_model=TrainedModel(
            config=cfg, model=model, module=module, variables=variables,
            input_channels=1,
        ),
        batch_size=2,
        max_peaks_per_node=4,
        max_instances=2,
    )


def test_bottomup_channels_first_infer_equivalence():
    """The channels-first confmap-head layout (TPU relayout optimization)
    must not change any infer output vs the plain NHWC path."""
    import numpy as np

    from sleap_tpu.inference import bottomup as bu_mod

    pred = _tiny_bottomup_predictor()
    rng = np.random.RandomState(7)
    images = rng.randint(0, 255, size=(2, 64, 64, 1), dtype=np.uint8)

    prior = bu_mod.CHANNELS_FIRST_CONFMAPS
    try:
        bu_mod.CHANNELS_FIRST_CONFMAPS = True
        out_cf = {
            k: np.asarray(v) for k, v in pred._build_infer_fn()(images).items()
        }
        bu_mod.CHANNELS_FIRST_CONFMAPS = False
        out_ref = {
            k: np.asarray(v) for k, v in pred._build_infer_fn()(images).items()
        }
    finally:
        bu_mod.CHANNELS_FIRST_CONFMAPS = prior

    assert set(out_cf) == set(out_ref)
    for k in out_ref:
        np.testing.assert_allclose(out_cf[k], out_ref[k], atol=1e-5, err_msg=k)
