"""Run the train-to-convergence parity suite and record results.

Drives the same logic as tests/training/test_train_to_accuracy.py but
persists each run under ``.convergence_runs/<fixture>/`` and appends a
summary line to ``.convergence_runs/summary.jsonl`` so the recorded numbers
in docs/TRAIN_PARITY.md are reproducible:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_convergence.py \
        [fixture ...]

With no arguments, runs every fixture that does not yet have a summary
line. Runs on whatever JAX backend is available (minutes on TPU, hours on
the 1-core CPU CI). Reference oracles:
/root/reference/tests/data/models/*/metrics.val.npz
(pipeline: /root/reference/sleap/nn/evals.py:683-775).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, ".convergence_runs")
MAP_TOL = 0.10

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests", "training"))

from test_train_to_accuracy import (  # noqa: E402
    FIXTURES,
    MODELS,
    _load_splits,
    _reference_oracle,
)

KEYS = ("oks.mOKS", "oks_voc.mAP", "dist.avg", "dist.p95")


def run_one(model_name):
    import jax

    from sleap_tpu.config import TrainingJobConfig
    from sleap_tpu.evals import load_metrics
    from sleap_tpu.training.trainer import Trainer

    ref_dir = os.path.join(MODELS, model_name)
    cfg = TrainingJobConfig.load_json(os.path.join(ref_dir, "training_config.json"))
    cfg.outputs.save_outputs = True
    cfg.outputs.runs_folder = RUNS
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
    t0 = time.perf_counter()
    trainer.train()
    train_s = time.perf_counter() - t0
    mine = load_metrics(trainer.run_path, split="val")
    ref, oracle_kind = _reference_oracle(model_name, val)
    entry = {
        "model": model_name,
        "backend": jax.devices()[0].platform,
        "train_s": round(train_s, 1),
        "oracle": oracle_kind,
        "mine": {k: round(float(mine[k]), 4) for k in KEYS},
        "ref": {k: round(float(ref[k]), 4) for k in KEYS},
        "run_path": trainer.run_path,
        "pass": bool(float(mine["oks_voc.mAP"]) >= float(ref["oks_voc.mAP"]) - MAP_TOL),
    }
    with open(os.path.join(RUNS, "summary.jsonl"), "a") as f:
        f.write(json.dumps(entry) + "\n")
    print(json.dumps(entry))
    return entry


def main():
    os.makedirs(RUNS, exist_ok=True)
    done = set()
    summary = os.path.join(RUNS, "summary.jsonl")
    if os.path.exists(summary):
        with open(summary) as f:
            done = {json.loads(line)["model"] for line in f if line.strip()}
    targets = sys.argv[1:] or [m for m in sorted(FIXTURES) if m not in done]
    print(f"running: {targets}", flush=True)
    ok = True
    for name in targets:
        entry = run_one(name)
        ok = ok and entry["pass"]
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
