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

    The per-batch computation runs under ``shard_map``: each device traces
    the FULL single-device program on its batch shard, so the fused Pallas
    kernels (peak finding, crops) stay in play per-device — GSPMD cannot
    auto-partition ``pallas_call`` custom calls, which is why a plain
    ``jit(in_shardings=...)`` would need the slower XLA fallbacks. Model
    params are closed-over constants and get replicated. The global batch
    size must be divisible by the ``data`` axis size.
    """
    if mesh is None:
        mesh = make_mesh()
    batch_spec = P("data")
    batch_sharding = NamedSharding(mesh, batch_spec)

    traceable = getattr(infer_fn, "__wrapped__", infer_fn)
    # check_vma off: per-shard peak indices etc. are intentionally
    # device-varying; there are no cross-device collectives to validate.
    fn = jax.jit(
        jax.shard_map(
            traceable,
            mesh=mesh,
            in_specs=batch_spec,
            out_specs=batch_spec,
            check_vma=False,
        )
    )

    def wrapped(*args):
        args = tuple(jax.device_put(a, batch_sharding) for a in args)
        return fn(*args)

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


def _batch_placer(mesh: Mesh, spatial: bool) -> Callable:
    """device_put batch leaves: B on data; +H on spatial for image-like
    (rank >= 3) leaves when spatial sharding is on. Lets jit infer mixed
    shardings from committed inputs (a single in_shardings spec cannot give
    different specs to different-rank leaves of the batch pytree)."""
    data = NamedSharding(mesh, P("data"))
    data_spatial = NamedSharding(mesh, P("data", "spatial"))

    def place(batch):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, data_spatial if (spatial and getattr(x, "ndim", 0) >= 3) else data
            ),
            batch,
        )

    return place


def sharded_train_step(
    train_step: Callable, mesh: Optional[Mesh] = None, spatial: bool = False
) -> Callable:
    """Shard a trainer train step: params/opt replicated, batch data-sharded
    (optionally height-sharded on the ``spatial`` axis — XLA inserts the conv
    halo exchanges).

    Expects the trainer's signature
    ``(params, batch_stats, opt_state, batch, rng) -> (params, bs, opt, loss)``.
    """
    if mesh is None:
        mesh = make_mesh()
    rep = NamedSharding(mesh, P())

    traceable = getattr(train_step, "__wrapped__", train_step)
    fn = jax.jit(
        traceable,
        in_shardings=(rep, rep, rep, None, rep),  # batch: inferred from args
        out_shardings=(rep, rep, rep, rep),
    )
    place = _batch_placer(mesh, spatial)

    def wrapped(params, batch_stats, opt_state, batch, rng):
        return fn(params, batch_stats, opt_state, place(batch), rng)

    return wrapped


def sharded_val_step(
    val_step: Callable, mesh: Optional[Mesh] = None, spatial: bool = False
) -> Callable:
    """Shard a trainer val step ``(params, batch_stats, batch, rng) -> loss``."""
    if mesh is None:
        mesh = make_mesh()
    rep = NamedSharding(mesh, P())

    traceable = getattr(val_step, "__wrapped__", val_step)
    fn = jax.jit(
        traceable,
        in_shardings=(rep, rep, None, rep),
        out_shardings=rep,
    )
    place = _batch_placer(mesh, spatial)

    def wrapped(params, batch_stats, batch, rng):
        return fn(params, batch_stats, place(batch), rng)

    return wrapped
