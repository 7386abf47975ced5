"""Multi-chip sharding utilities.

The reference has no multi-device support at all (SURVEY §2.12); this module
is new design. Models in this domain are small (<= ~35M params), so the
scaling recipe is:

- **DP (data parallel)** over the batch axis for training and batch
  inference: params replicated, batch sharded on the ``data`` mesh axis,
  gradient all-reduce inserted by XLA from the sharding annotations.
- **Spatial sharding** (context-parallel analog for CNNs): activations of
  very large frames sharded along H on a ``spatial`` axis; XLA's SPMD
  partitioner inserts the halo exchanges for convolutions automatically.
- **Multi-host**: ``jax.distributed.initialize`` + the same mesh spanning
  hosts; per-host video decode feeds the local shard.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, spatial) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % spatial != 0:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}.")
    arr = np.asarray(devices).reshape(n // spatial, spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None) -> NamedSharding:
    """Sharding for (B, H, W, C) batches: B on data, optionally H on spatial."""
    if spatial_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = [None, None, None, None]
    spec[0] = "data"
    spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put a host batch with the leading axis sharded on ``data``."""
    sharding = NamedSharding(mesh, P("data"))
    return {
        k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()
    }


def replicate_pytree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
