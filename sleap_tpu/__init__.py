"""sleap-tpu: TPU-native multi-animal pose estimation and tracking.

A from-scratch JAX/XLA/Pallas framework with the capabilities of SLEAP
(talmolab/sleap): labeled-data management (.slp), confidence-map models,
single-instance / top-down / bottom-up / multi-class inference, subpixel peak
finding, PAF grouping, cross-frame tracking, and OKS/mAP evaluation — with
the entire prediction path compiled on-chip.

Public API mirrors ``/root/reference/sleap/__init__.py:8-21``.
"""

import logging

logging.basicConfig(level=logging.INFO)

from sleap_tpu.version import __version__, versions
from sleap_tpu.core.skeleton import Node, Skeleton
from sleap_tpu.core.instance import (
    Instance,
    InstancesList,
    LabeledFrame,
    PredictedInstance,
    Track,
)
from sleap_tpu.core.labels import Labels, SuggestionFrame, load_file
from sleap_tpu.io.video import Video, load_video


def load_model(*args, **kwargs):
    from sleap_tpu.inference.predictors import load_model as _load_model

    return _load_model(*args, **kwargs)


def export_model(*args, **kwargs):
    from sleap_tpu.inference.export import export_model as _export_model

    return _export_model(*args, **kwargs)


def load_config(*args, **kwargs):
    from sleap_tpu.config import load_config as _load_config

    return _load_config(*args, **kwargs)


def load_metrics(*args, **kwargs):
    from sleap_tpu.evals import load_metrics as _load_metrics

    return _load_metrics(*args, **kwargs)


def __getattr__(name):
    # Lazy top-level re-exports (PEP 562) so importing the package stays
    # light; reference parity: sleap/__init__.py:20 exports TrainingJobConfig.
    if name == "TrainingJobConfig":
        from sleap_tpu.config import TrainingJobConfig

        return TrainingJobConfig
    raise AttributeError(f"module 'sleap_tpu' has no attribute {name!r}")


def use_cpu_only():
    from sleap_tpu.system import use_cpu_only as _use_cpu_only

    _use_cpu_only()


def disable_preallocation():
    from sleap_tpu.system import disable_preallocation as _disable

    _disable()


def system_summary():
    from sleap_tpu.system import summary

    summary()
