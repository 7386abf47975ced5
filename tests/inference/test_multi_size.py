"""Mixed input sizes through one predictor (reference test_inference.py:997).

The reference needs ``resize_input_layer=True`` to re-plumb its Keras input;
the static-shape JAX design recompiles per input shape instead — same user
contract: one loaded predictor serves ndarray batches of any size.
"""

import os

import numpy as np
import pytest

MODELS = "/root/reference/tests/data/models"


def _require(p):
    if not os.path.exists(p):
        pytest.skip(f"reference fixture unavailable: {p}")
    return p


@pytest.mark.slow
def test_topdown_multi_size_inference():
    import sleap_tpu
    from sleap_tpu.io.video import Video

    centroid = _require(os.path.join(MODELS, "minimal_instance.UNet.centroid"))
    instance = _require(
        os.path.join(MODELS, "minimal_instance.UNet.centered_instance")
    )
    vid384 = Video.from_filename(
        _require("/root/reference/tests/data/videos/centered_pair_small.mp4"),
        grayscale=True,
    )
    vid1024 = Video.from_filename(
        _require("/root/reference/tests/data/tracks/clip.mp4"), grayscale=True
    )

    predictor = sleap_tpu.load_model([centroid, instance], batch_size=2)

    imgs = np.stack([vid384.get_frame(i) for i in range(2)])
    assert imgs.shape == (2, 384, 384, 1)
    preds = predictor.predict(imgs)
    assert len(preds) == 2

    imgs = np.stack([vid1024.get_frame(i) for i in range(2)])
    assert imgs.shape == (2, 1024, 1024, 1)
    preds = predictor.predict(imgs)
    assert len(preds) == 2
    # Predicted coordinates land inside the (larger) frame.
    pts = np.concatenate(
        [
            inst.numpy()
            for lf in preds.labeled_frames
            for inst in lf.predicted_instances
        ]
    ) if any(lf.predicted_instances for lf in preds.labeled_frames) else None
    if pts is not None:
        finite = pts[np.isfinite(pts).all(axis=1)]
        if len(finite):
            assert finite.min() >= -1 and finite.max() <= 1024