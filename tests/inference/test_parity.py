"""End-to-end parity against the reference's own saved predictions.

The reference model folders ship ``labels_pr.val.slp`` — predictions produced
by the TF pipeline on ``labels_gt.val.slp``. Running our predictors on the
same inputs with the reference checkpoints must reproduce those keypoints to
sub-pixel tolerance (BASELINE.json requirement).
"""

import os

import numpy as np
import pytest

MODELS = "/root/reference/tests/data/models"


def _sorted_points(labels):
    out = []
    for lf in labels.labeled_frames:
        out.append(
            np.array(sorted([i.numpy().tolist() for i in lf.predicted_instances]))
        )
    return out


@pytest.mark.slow
def test_topdown_gt_centroid_parity():
    d = os.path.join(MODELS, "minimal_instance.UNet.centered_instance")
    if not os.path.isdir(d):
        pytest.skip("reference fixture unavailable")
    import sleap_tpu
    from sleap_tpu.inference.predictors import TopDownPredictor

    gt = sleap_tpu.load_file(d + "/labels_gt.val.slp")
    ref = sleap_tpu.load_file(d + "/labels_pr.val.slp")
    pred = TopDownPredictor.from_trained_models(confmap_model_path=d, max_instances=4)
    ours = pred.predict(gt)
    assert len(ours) == len(ref)
    for a, b in zip(_sorted_points(ref), _sorted_points(ours)):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-3)


@pytest.mark.slow
def test_single_instance_runs_close_to_gt():
    d = os.path.join(MODELS, "minimal_robot.UNet.single_instance")
    if not os.path.isdir(d):
        pytest.skip("reference fixture unavailable")
    import sleap_tpu
    from sleap_tpu.inference.predictors import SingleInstancePredictor

    gt = sleap_tpu.load_file(d + "/labels_gt.val.slp")
    pred = SingleInstancePredictor.from_trained_models(d)
    ours = pred.predict(gt)
    assert len(ours) == len(gt)
    lf = ours[0]
    assert len(lf.predicted_instances) == 1
    # Tiny fixture model: just assert it's in the right neighborhood.
    err = np.abs(lf.predicted_instances[0].numpy() - gt[0].user_instances[0].numpy())
    assert np.nanmax(err) < 15
