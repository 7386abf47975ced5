"""Multi-chip / multi-host execution helpers.

New design (the reference is strictly single-device, SURVEY §2.12):

- :func:`sharded_infer_fn` shards a predictor's jitted per-batch function
  over the ``data`` axis of a mesh — multi-chip batch inference where each
  chip takes a slice of the batch and XLA handles the rest.
- :func:`sharded_train_step` wraps a trainer train-step with replicated
  params and data-sharded batches; the gradient all-reduce is inserted by
  XLA from the sharding annotations.
- :func:`initialize_multihost` sets up ``jax.distributed`` for pod slices;
  per-host video sharding follows the reference's embarrassingly-parallel
  predict loop (each host decodes its own frame range).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sleap_tpu.parallel.mesh import make_mesh, replicate_pytree


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for multi-host (DCN) execution."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_frame_range(n_frames: int) -> range:
    """This host's shard of a video's frames for multi-host batch inference."""
    pid, n = jax.process_index(), jax.process_count()
    per = -(-n_frames // n)
    return range(pid * per, min((pid + 1) * per, n_frames))


def sharded_infer_fn(
    infer_fn: Callable, mesh: Optional[Mesh] = None
) -> Callable:
    """Wrap a predictor's per-batch function for data-parallel execution.

    The batch axis is sharded over the mesh's ``data`` axis; model params are
    closed-over constants and get replicated by XLA. The global batch size
    must be divisible by the ``data`` axis size.
    """
    if mesh is None:
        mesh = make_mesh()
    batch_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    traceable = getattr(infer_fn, "__wrapped__", infer_fn)
    # All positional args are batch-leading (images, gt centroids, masks, ...):
    # shard each on the data axis; outputs gathered to replicated for the host.
    fn = jax.jit(
        traceable,
        in_shardings=batch_sharding,
        out_shardings=rep,
    )

    def wrapped(*args):
        from sleap_tpu.ops import peak_finding

        args = tuple(jax.device_put(a, batch_sharding) for a in args)
        # GSPMD cannot auto-partition pallas_call custom calls: pin the XLA
        # peak-finding implementations while tracing/running sharded.
        prev = peak_finding.FORCE_XLA_PEAKS
        peak_finding.FORCE_XLA_PEAKS = True
        try:
            return fn(*args)
        finally:
            peak_finding.FORCE_XLA_PEAKS = prev

    return wrapped


def make_sharded_predictor(predictor, mesh: Optional[Mesh] = None):
    """Replace a predictor's infer fn with the data-parallel version.

    ``predictor.batch_size`` is scaled by the data-axis size so each chip
    keeps its original per-chip batch.
    """
    if mesh is None:
        mesh = make_mesh()
    if predictor._infer_fn is None:
        predictor._infer_fn = predictor._build_infer_fn()
    predictor._infer_fn = sharded_infer_fn(predictor._infer_fn, mesh)
    predictor.batch_size = predictor.batch_size * mesh.shape["data"]
    return predictor


def sharded_train_step(
    train_step: Callable, mesh: Optional[Mesh] = None
) -> Callable:
    """Shard a trainer train step: params/opt replicated, batch data-sharded.

    Expects the trainer's signature
    ``(params, batch_stats, opt_state, batch, rng) -> (params, bs, opt, loss)``.
    """
    if mesh is None:
        mesh = make_mesh()
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    traceable = getattr(train_step, "__wrapped__", train_step)
    return jax.jit(
        traceable,
        in_shardings=(rep, rep, rep, data, rep),
        out_shardings=(rep, rep, rep, rep),
    )


def sharded_val_step(
    val_step: Callable, mesh: Optional[Mesh] = None
) -> Callable:
    """Shard a trainer val step ``(params, batch_stats, batch, rng) -> loss``."""
    if mesh is None:
        mesh = make_mesh()
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    traceable = getattr(val_step, "__wrapped__", val_step)
    return jax.jit(
        traceable,
        in_shardings=(rep, rep, data, rep),
        out_shardings=rep,
    )
