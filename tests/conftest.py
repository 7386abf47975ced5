"""Shared test config.

Runs JAX on a virtual 8-device CPU mesh so multi-chip sharding paths can be
tested without TPU hardware (env must be set before jax is imported).
Fixture data is read directly from the read-only reference checkout
(``/root/reference/tests/data``) — tests depending on it skip if absent.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"  # JAX_PLATFORMS is ignored by the axon plugin
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
import pytest

# Single-core environment: persist compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

REF_DATA = Path("/root/reference/tests/data")


def ref_data(relpath: str) -> str:
    """Absolute path to a reference fixture file; skip the test if absent."""
    p = REF_DATA / relpath
    if not p.exists():
        pytest.skip(f"reference fixture not available: {p}")
    return str(p)


@pytest.fixture
def minimal_slp():
    return ref_data("slp_hdf5/minimal_instance.slp")


@pytest.fixture
def small_robot_slp():
    return ref_data("slp_hdf5/small_robot_minimal.slp")


@pytest.fixture
def predictions_slp():
    return ref_data("tracks/clip.predictions.slp")


@pytest.fixture
def centered_pair_predictions_slp():
    return ref_data("hdf5_format_v1/centered_pair_predictions.slp")


@pytest.fixture
def centered_pair_video():
    return ref_data("videos/centered_pair_small.mp4")


@pytest.fixture
def small_robot_video():
    return ref_data("videos/small_robot.mp4")


@pytest.fixture
def tracks_clip_video():
    return ref_data("tracks/clip.mp4")


@pytest.fixture
def min_labels(minimal_slp):
    from sleap_tpu.core.labels import Labels

    return Labels.load_file(minimal_slp)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
