"""Device management.

Rebuild of ``/root/reference/sleap/nn/system.py:14-211`` for the JAX/TPU
stack: list/select accelerators, CPU-only mode, and a system summary.
(The reference manages CUDA GPUs + memory growth; JAX preallocation and
platform selection are the equivalents here.)
"""

from __future__ import annotations

import os
from typing import List, Optional


def get_all_devices() -> List:
    import jax

    return jax.devices()


def get_all_tpus() -> List:
    import jax

    try:
        return [d for d in jax.devices() if "tpu" in d.platform.lower() or "TPU" in str(d)]
    except RuntimeError:
        return []


get_all_gpus = get_all_tpus  # API-compat alias for reference code


def is_accelerator_system() -> bool:
    return len(get_all_tpus()) > 0


def use_cpu_only() -> None:
    """Run everything on CPU (reference system.py ``use_cpu_only``)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def use_first_gpu() -> None:
    _select_device(0)


def use_last_gpu() -> None:
    _select_device(-1)


def use_gpu(device_ind: int) -> None:
    _select_device(device_ind)


def _select_device(index: int) -> None:
    """Pin default computation to one accelerator."""
    import jax

    devices = jax.devices()
    jax.config.update("jax_default_device", devices[index])


def disable_preallocation() -> None:
    os.environ["XLA_PYTHON_CLIENT_PREALLOCATE"] = "false"


def enable_gpu_memory_growth() -> None:
    # JAX equivalent of TF memory growth.
    disable_preallocation()


def best_logical_device_name() -> str:
    import jax

    devices = jax.devices()
    return str(devices[0])


def summary() -> None:
    """Print a device summary (reference system.py ``summary``)."""
    import jax

    devices = jax.devices()
    print(f"Devices: {len(devices)}")
    for i, d in enumerate(devices):
        print(f"  [{i}] {d} (platform: {d.platform})")
    print(f"Default backend: {jax.default_backend()}")
    print(f"Process count: {jax.process_count()}")
