"""``sleap-train``: train a model from a config + labels.

Rebuild of the reference CLI (``/root/reference/sleap/nn/training.py:1802``
``create_trainer_using_cli`` and ``main:2038``) with the same argument
surface (minus GPU-selection flags, replaced by JAX device handling).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import List, Optional

logger = logging.getLogger(__name__)


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train a sleap-tpu model.")
    parser.add_argument(
        "training_job_path",
        help="Path to a training job profile JSON or a model run folder.",
    )
    parser.add_argument(
        "labels_path", nargs="?", default=None,
        help="Path to labels (.slp) to use for training.",
    )
    parser.add_argument("--val_labels", "--val", default=None)
    parser.add_argument("--test_labels", "--test", default=None)
    parser.add_argument("--base_checkpoint", default=None)
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--save_viz", action="store_true")
    parser.add_argument("--zmq", action="store_true")
    parser.add_argument("--controller_port", type=int, default=9000)
    parser.add_argument("--publish_port", type=int, default=9001)
    parser.add_argument("--run_name", default=None)
    parser.add_argument("--prefix", default="")
    parser.add_argument("--suffix", default="")
    parser.add_argument("--cpu", action="store_true", help="Run on CPU only.")
    parser.add_argument(
        "--n-devices", type=int, default=None, dest="n_devices",
        help="Data-parallel training over this many devices (default: 1). "
        "Batches are sharded over a device mesh; params are replicated and "
        "the gradient all-reduce rides the interconnect.",
    )
    parser.add_argument(
        "--mixed-precision", action="store_true", dest="mixed_precision",
        help="Run the forward/backward pass in bfloat16 on the MXU; params, "
        "optimizer state, and the loss stay float32 (checkpoints are "
        "dtype-identical to f32 training).",
    )
    parser.add_argument(
        "--spatial-sharding", type=int, default=1, dest="spatial_sharding",
        help="Also shard frame HEIGHT over this many devices (the mesh "
        "becomes (data: n/spatial, spatial)); XLA inserts conv halo "
        "exchanges. For frames too large for one chip's HBM. Must divide "
        "--n-devices.",
    )
    return parser


def create_trainer_using_cli(args: Optional[List[str]] = None):
    from sleap_tpu.config import TrainingJobConfig
    from sleap_tpu.training.trainer import Trainer

    parser = make_parser()
    ns = parser.parse_args(args)

    if ns.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    cfg = TrainingJobConfig.load_json(ns.training_job_path)
    if ns.labels_path:
        cfg.data.labels.training_labels = ns.labels_path
    if ns.val_labels:
        cfg.data.labels.validation_labels = ns.val_labels
    if ns.test_labels:
        cfg.data.labels.test_labels = ns.test_labels
    if ns.base_checkpoint:
        cfg.model.base_checkpoint = ns.base_checkpoint
    if ns.run_name:
        cfg.outputs.run_name = ns.run_name
    if ns.prefix:
        cfg.outputs.run_name_prefix = ns.prefix
    if ns.suffix:
        cfg.outputs.run_name_suffix = ns.suffix
    if ns.mixed_precision:
        cfg.optimization.mixed_precision = True
    if ns.tensorboard:
        cfg.outputs.tensorboard.write_logs = True
    if ns.zmq:
        cfg.outputs.zmq.publish_updates = True
        cfg.outputs.zmq.subscribe_to_controller = True
        cfg.outputs.zmq.controller_address = f"tcp://127.0.0.1:{ns.controller_port}"
        cfg.outputs.zmq.publish_address = f"tcp://127.0.0.1:{ns.publish_port}"

    return Trainer.from_config(
        cfg, n_devices=ns.n_devices, spatial_sharding=ns.spatial_sharding
    )


def main(args: Optional[List[str]] = None) -> None:
    logging.basicConfig(level=logging.INFO)
    trainer = create_trainer_using_cli(args)
    trainer.train()


if __name__ == "__main__":
    main()
