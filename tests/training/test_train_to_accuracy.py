"""Train-to-convergence accuracy parity vs the reference fixture oracles.

BASELINE.md's last unproven accuracy claim: models trained BY THIS REPO (not
just inference over reference-trained weights) reach the reference's
committed validation metrics. Each test loads the reference fixture model's
own ``training_config.json`` + ``labels_gt.{train,val}.slp``, trains with
the real Trainer through the full reference schedule (10 epochs x 100
batches), runs ``evaluate_model``, and compares ``metrics.val.npz`` against
the reference's committed oracle
(/root/reference/tests/data/models/*/metrics.val.npz; reference pipeline:
/root/reference/sleap/nn/evals.py:683-775).

Runtime: minutes on a TPU, ~2 h on this single-core CPU CI — so the tests
run only when ``SLEAP_TPU_RUN_CONVERGENCE=1``. A full run's recorded
numbers live in docs/TRAIN_PARITY.md.
"""

import json
import os

import numpy as np
import pytest

MODELS = "/root/reference/tests/data/models"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("SLEAP_TPU_RUN_CONVERGENCE") != "1",
        reason="convergence training takes hours on the 1-core CPU CI; "
        "set SLEAP_TPU_RUN_CONVERGENCE=1 to run (see docs/TRAIN_PARITY.md "
        "for a recorded full run)",
    ),
]

# mAP tolerance: the minis train on ONE labeled frame and validate on one,
# so run-to-run spread is real; 0.10 absolute mAP is well inside the spread
# observed across seeds while still failing on any systematic regression
# (e.g. a broken GT codec trains to mAP ~0).
MAP_TOL = 0.10


def _train_and_eval(model_name, tmp_path):
    from sleap_tpu.config import TrainingJobConfig
    from sleap_tpu.core.labels import Labels
    from sleap_tpu.evals import load_metrics
    from sleap_tpu.training.trainer import Trainer

    ref_dir = os.path.join(MODELS, model_name)
    if not os.path.isdir(ref_dir):
        pytest.skip(f"reference fixture unavailable: {ref_dir}")
    cfg = TrainingJobConfig.load_json(os.path.join(ref_dir, "training_config.json"))
    cfg.outputs.save_outputs = True
    cfg.outputs.runs_folder = str(tmp_path)
    cfg.outputs.run_name = model_name
    cfg.outputs.run_name_suffix = ""
    cfg.outputs.save_visualizations = False
    cfg.outputs.zip_outputs = False
    train = Labels.load_file(os.path.join(ref_dir, "labels_gt.train.slp"))
    val = Labels.load_file(os.path.join(ref_dir, "labels_gt.val.slp"))
    trainer = Trainer.from_config(cfg, training_labels=train, validation_labels=val)
    trainer.setup()
    trainer.train()
    mine = load_metrics(trainer.run_path, split="val")
    ref = load_metrics(ref_dir, split="val")
    return mine, ref


@pytest.mark.parametrize(
    "model_name",
    ["minimal_instance.UNet.bottomup", "minimal_instance.UNet.centered_instance"],
)
def test_train_to_reference_accuracy(model_name, tmp_path):
    mine, ref = _train_and_eval(model_name, tmp_path)
    mine_map = float(mine["oks_voc.mAP"])
    ref_map = float(ref["oks_voc.mAP"])
    print(
        json.dumps(
            {
                "model": model_name,
                "mine": {k: round(float(mine[k]), 4) for k in
                         ("oks.mOKS", "oks_voc.mAP", "dist.avg")},
                "ref": {k: round(float(ref[k]), 4) for k in
                        ("oks.mOKS", "oks_voc.mAP", "dist.avg")},
            }
        )
    )
    assert mine_map >= ref_map - MAP_TOL, (
        f"own-trained mAP {mine_map:.4f} below reference oracle "
        f"{ref_map:.4f} - {MAP_TOL}"
    )
