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
