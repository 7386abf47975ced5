"""Train-to-convergence accuracy parity vs the reference fixture oracles.

BASELINE.md's last unproven accuracy claim: models trained BY THIS REPO (not
just inference over reference-trained weights) reach the reference's
committed validation metrics. Each test loads the reference fixture model's
own ``training_config.json`` + labels splits, trains with the real Trainer,
runs ``evaluate_model``, and compares against the reference oracle:

- ``metrics.val.npz`` where the fixture commits one
  (/root/reference/tests/data/models/*/metrics.val.npz; reference pipeline:
  /root/reference/sleap/nn/evals.py:683-775);
- otherwise (single_instance, both multiclass fixtures ship only
  ``best_model.h5``) the reference's own trained model evaluated through
  this repo's predictor + ``evaluate`` on the same val split — i.e. "our
  training reaches the accuracy of the reference's training on its own
  fixture".

Splits: fixtures with committed ``labels_gt.{train,val}.slp`` use them
verbatim; the multiclass fixtures commit no splits (their configs say
``validation_fraction: 0.1`` over ``tests/data/tracks/clip.2node.slp``), so
a seeded 0.1 split is made here.

Schedules: each fixture's own ``training_config.json`` schedule, with epochs
capped at 30 for the multiclass pair (configs say 200 with early-stopping
patience 20; the reference's own committed ``training_log.csv`` files show
its minis stopped at 10-24 epochs, so 30 is past the regime it trained in).

Runtime: minutes on a TPU, hours on this single-core CPU CI — so the tests
run only when ``SLEAP_TPU_RUN_CONVERGENCE=1``. A full run's recorded
numbers live in docs/TRAIN_PARITY.md.
"""

import json
import os

import numpy as np
import pytest

MODELS = "/root/reference/tests/data/models"
TRACKS_2NODE = "/root/reference/tests/data/tracks/clip.2node.slp"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("SLEAP_TPU_RUN_CONVERGENCE") != "1",
        reason="convergence training takes hours on the 1-core CPU CI; "
        "set SLEAP_TPU_RUN_CONVERGENCE=1 to run (see docs/TRAIN_PARITY.md "
        "for a recorded full run)",
    ),
]

# mAP tolerance: the minis train on tiny datasets (1-90 labeled frames), so
# run-to-run spread is real; 0.10 absolute mAP is well inside the spread
# observed across seeds while still failing on any systematic regression
# (e.g. a broken GT codec trains to mAP ~0).
MAP_TOL = 0.10

# (fixture name, epochs cap or None=config schedule)
FIXTURES = {
    "minimal_instance.UNet.bottomup": None,
    "minimal_instance.UNet.centered_instance": None,
    "minimal_instance.UNet.centroid": None,
    "minimal_robot.UNet.single_instance": 30,
    # The identity heads (sigmoid + MSE on ~0.2%-positive class maps) need
    # the config's full 200-epoch plateau schedule to escape the
    # all-zeros saturation plateau; 30 epochs measurably under-trains them.
    "min_tracks_2node.UNet.bottomup_multiclass": None,
    "min_tracks_2node.UNet.topdown_multiclass": None,
}


def _load_splits(model_name, cfg):
    """Fixture-committed labels_gt splits, else a seeded split of the
    config's dataset (the multiclass fixtures commit no splits)."""
    from sleap_tpu.core.labels import Labels
    from sleap_tpu.data.dataset_ops import split_labels_train_val

    ref_dir = os.path.join(MODELS, model_name)
    train_path = os.path.join(ref_dir, "labels_gt.train.slp")
    if os.path.exists(train_path):
        return (
            Labels.load_file(train_path),
            Labels.load_file(os.path.join(ref_dir, "labels_gt.val.slp")),
        )
    labels = Labels.load_file(TRACKS_2NODE)
    frac = cfg.data.labels.validation_fraction or 0.1
    return split_labels_train_val(labels, frac, seed=42)


def _reference_oracle(model_name, val_labels):
    """Oracle metrics: the committed metrics.val.npz when present, else the
    reference's own best_model.h5 evaluated on the same val split."""
    from sleap_tpu.evals import evaluate_model, load_metrics

    ref_dir = os.path.join(MODELS, model_name)
    if os.path.exists(os.path.join(ref_dir, "metrics.val.npz")):
        return load_metrics(ref_dir, split="val"), "committed metrics.val.npz"
    _, metrics = evaluate_model(None, val_labels, ref_dir, save=False)
    return metrics, "reference best_model.h5 evaluated on val split"


def _train_and_eval(model_name, tmp_path):
    from sleap_tpu.config import TrainingJobConfig
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
    epochs_cap = FIXTURES[model_name]
    if epochs_cap is not None:
        cfg.optimization.epochs = min(cfg.optimization.epochs, epochs_cap)
    train, val = _load_splits(model_name, cfg)
    trainer = Trainer.from_config(cfg, training_labels=train, validation_labels=val)
    trainer.setup()
    trainer.train()
    mine = load_metrics(trainer.run_path, split="val")
    ref, oracle_kind = _reference_oracle(model_name, val)
    return mine, ref, oracle_kind


@pytest.mark.parametrize("model_name", sorted(FIXTURES))
def test_train_to_reference_accuracy(model_name, tmp_path):
    mine, ref, oracle_kind = _train_and_eval(model_name, tmp_path)
    mine_map = float(mine["oks_voc.mAP"])
    ref_map = float(ref["oks_voc.mAP"])
    print(
        json.dumps(
            {
                "model": model_name,
                "oracle": oracle_kind,
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
