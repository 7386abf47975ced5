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

from sleap_tpu.version import __version__
from sleap_tpu.core.skeleton import Node, Skeleton
from sleap_tpu.core.instance import (
    Instance,
    LabeledFrame,
    PredictedInstance,
    Track,
)
from sleap_tpu.core.labels import Labels, SuggestionFrame, load_file
from sleap_tpu.io.video import Video


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


def use_cpu_only():
    from sleap_tpu.system import use_cpu_only as _use_cpu_only

    _use_cpu_only()


def system_summary():
    from sleap_tpu.system import summary

    summary()
