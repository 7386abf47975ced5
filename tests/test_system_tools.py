"""Smoke tests for system/diagnostic/viz/prefs surfaces and the ResNet
backbone architecture (reference tests/nn/architectures/test_resnet.py,
tests/test_diagnostic.py analogs)."""

import numpy as np
import pytest


def test_system_helpers(capsys):
    from sleap_tpu import system

    devs = system.get_all_devices()
    assert len(devs) >= 1
    assert isinstance(system.is_accelerator_system(), bool)
    name = system.best_logical_device_name()
    assert isinstance(name, str) and name
    system.summary()
    assert capsys.readouterr().out


def test_diagnostic_summary():
    from sleap_tpu.diagnostic import system_summary

    text = system_summary()
    assert "jax" in text.lower()
    assert "devices" in text.lower() or "platform" in text.lower()


def test_nn_viz_plots(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from sleap_tpu import nn_viz
    from sleap_tpu.core.instance import Instance
    from sleap_tpu.core.skeleton import Skeleton

    img = np.random.rand(32, 32, 1).astype(np.float32)
    cms = np.random.rand(32, 32, 3).astype(np.float32)
    nn_viz.plot_img(img)
    nn_viz.plot_confmaps(cms)
    nn_viz.plot_peaks(np.array([[4.0, 5.0]]), np.array([[6.0, 7.0]]))
    skel = Skeleton.from_names_and_edge_inds(["a", "b"], [(0, 1)])
    inst = Instance(skeleton=skel, points=np.array([[4.0, 4.0], [20.0, 20.0]]))
    nn_viz.plot_instance(inst)
    png = nn_viz.generate_skeleton_preview_image(inst)
    assert isinstance(png, bytes) and png[:4] == b"\x89PNG"
    import matplotlib.pyplot as plt

    plt.close("all")


def test_prefs_roundtrip(tmp_path, monkeypatch):
    from sleap_tpu import prefs as prefs_mod

    p = prefs_mod.Preferences()
    # dict-style access with defaults
    keys = list(p.keys()) if hasattr(p, "keys") else []
    assert isinstance(keys, list)


def test_resnet_backbone_shapes():
    import jax
    import jax.numpy as jnp

    from sleap_tpu.config import (
        BackboneConfig,
        CentroidsHeadConfig,
        HeadsConfig,
        ModelConfig,
        ResNetConfig,
    )
    from sleap_tpu.models.model import Model

    cfg = ModelConfig(
        backbone=BackboneConfig(
            resnet=ResNetConfig(
                version="ResNet50",
                weights="random",  # imagenet weights are gated offline
                max_stride=32,
                output_stride=4,
            )
        ),
        heads=HeadsConfig(centroid=CentroidsHeadConfig(output_stride=4, sigma=2.5)),
    )
    model = Model.from_config(cfg)
    module, variables = model.init(jax.random.PRNGKey(0), (64, 64, 1))
    out = module.apply(variables, jnp.zeros((1, 64, 64, 1)), train=False)
    [(name, cm)] = [(k, v) for k, v in out.items() if "Centroid" in k]
    assert cm.shape == (1, 16, 16, 1)  # stride 4 on 64², one centroid channel
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert n_params > 1e6  # a real ResNet50 trunk, not a stub
