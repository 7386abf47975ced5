"""Data-pipeline block tests (providers, normalization, resizing,
augmentation) — reference tests/nn/data/* strategy (SURVEY §4)."""

import numpy as np
import pytest

from sleap_tpu.core.instance import Instance, LabeledFrame
from sleap_tpu.core.labels import Labels
from sleap_tpu.core.skeleton import Skeleton
from sleap_tpu.io.video import Video


@pytest.fixture
def labels():
    rng = np.random.default_rng(0)
    skel = Skeleton.from_names_and_edge_inds(["a", "b", "c"], [(0, 1), (1, 2)])
    frames = rng.integers(0, 255, (4, 48, 64, 1), np.uint8)
    video = Video.from_numpy(frames)
    lfs = [
        LabeledFrame(
            video=video, frame_idx=i,
            instances=[Instance(skeleton=skel, points=rng.uniform(5, 40, (3, 2)))],
        )
        for i in range(4)
    ]
    return Labels(lfs)


def test_labels_reader(labels):
    from sleap_tpu.data.providers import LabelsReader

    reader = LabelsReader.from_user_instances(labels)
    examples = list(reader)
    assert len(examples) == 4
    ex = examples[0]
    assert ex["image"].shape == (48, 64, 1)
    assert ex["instances"].shape[1:] == (3, 2)
    assert ex["frame_ind"] == 0
    assert ex["video_ind"] == 0


def test_video_reader(labels):
    from sleap_tpu.data.providers import VideoReader

    reader = VideoReader(video=labels.video, example_indices=[1, 3])
    examples = list(reader)
    assert len(examples) == 2
    assert examples[0]["frame_ind"] == 1
    assert examples[1]["frame_ind"] == 3


def test_batch_examples_padding(labels):
    from sleap_tpu.data.providers import LabelsReader, batch_examples

    reader = LabelsReader.from_user_instances(labels)
    batches = list(batch_examples(reader, batch_size=3))
    assert len(batches) == 2
    b0, n0 = batches[0]
    b1, n1 = batches[1]
    assert n0 == 3 and n1 == 1
    # Final batch is padded to the static batch size.
    assert b1["image"].shape[0] == 3


def test_normalization_modes():
    import jax.numpy as jnp

    from sleap_tpu.data.normalization import ensure_float, ensure_grayscale, ensure_rgb

    img = jnp.ones((4, 6, 3), jnp.uint8) * 128
    f = ensure_float(img)
    assert f.dtype == jnp.float32
    np.testing.assert_allclose(float(f[0, 0, 0]), 128 / 255.0, rtol=1e-6)
    g = ensure_grayscale(img)
    assert g.shape[-1] == 1
    r = ensure_rgb(g)
    assert r.shape[-1] == 3


def test_resize_truncates_and_casts_back():
    import jax.numpy as jnp

    from sleap_tpu.data.resizing import resize_image

    img = jnp.ones((1, 45, 63, 1), jnp.uint8) * 200
    out = resize_image(img, 0.5)
    # TF semantics: int(45*0.5)=22, int(63*0.5)=31; dtype preserved.
    assert out.shape == (1, 22, 31, 1)
    assert out.dtype == jnp.uint8


def test_pad_to_stride():
    import jax.numpy as jnp

    from sleap_tpu.data.resizing import find_padding_for_stride, pad_to_stride

    assert find_padding_for_stride(45, 63, 16) == (3, 1)
    img = jnp.zeros((1, 45, 63, 1), jnp.float32)
    out = pad_to_stride(img, 16)
    assert out.shape == (1, 48, 64, 1)


def test_augmentation_keypoints_follow_image():
    """A pure rotation must rotate points with the image."""
    import jax

    from sleap_tpu.data.augmentation import augment_example
    from sleap_tpu.config import AugmentationConfig

    cfg = AugmentationConfig(rotate=True, rotation_min_angle=90, rotation_max_angle=90)
    img = np.zeros((33, 33, 1), np.float32)
    img[16, 24, 0] = 1.0  # bright pixel right of center
    pts = np.array([[[24.0, 16.0]]], np.float32)  # (I, N, 2) xy on it
    out_img, out_pts = augment_example(jax.random.PRNGKey(0), img, pts, cfg)
    oy, ox = np.unravel_index(np.argmax(np.asarray(out_img[:, :, 0])), (33, 33))
    px, py = np.asarray(out_pts[0, 0])
    # The transformed point lands on the moved bright pixel (within a pixel).
    assert abs(px - ox) < 1.5 and abs(py - oy) < 1.5


def test_instance_centroids_anchor_and_fallback():
    from sleap_tpu.data.instance_centroids import get_instance_centroids

    pts = np.array(
        [
            [[10.0, 12.0], [20.0, 22.0], [30.0, 32.0]],
            [[np.nan, np.nan], [16.0, 18.0], [26.0, 28.0]],
        ],
        np.float32,
    )
    anchors = get_instance_centroids(pts, anchor_ind=0)
    np.testing.assert_allclose(anchors[0], [10.0, 12.0])
    # Anchor missing -> bbox midpoint of visible points.
    np.testing.assert_allclose(anchors[1], [21.0, 23.0])


def test_dataset_ops_chain(labels):
    from sleap_tpu.data.dataset_ops import (
        Batcher, KeyFilter, KeyRenamer, LambdaFilter, LambdaMap,
        Preloader, Repeater, Shuffler, Unbatcher,
    )
    from sleap_tpu.data.providers import LabelsReader

    reader = LabelsReader.from_user_instances(labels)
    examples = Preloader().transform_dataset(reader)
    assert len(examples) == 4

    shuffled = list(Shuffler(seed=0, buffer_size=2).transform_dataset(examples))
    assert sorted(ex["frame_ind"] for ex in shuffled) == [0, 1, 2, 3]

    kept = list(LambdaFilter(lambda ex: ex["frame_ind"] % 2 == 0).transform_dataset(examples))
    assert [ex["frame_ind"] for ex in kept] == [0, 2]

    renamed = list(
        KeyRenamer(["image"], ["img"]).transform_dataset(examples)
    )
    assert "img" in renamed[0] and "image" not in renamed[0]

    filtered = list(KeyFilter(["image", "frame_ind"]).transform_dataset(examples))
    assert set(filtered[0]) == {"image", "frame_ind"}

    mapped = list(LambdaMap(lambda ex: {**ex, "twice": ex["frame_ind"] * 2}).transform_dataset(examples))
    assert mapped[3]["twice"] == 6

    batches = list(Batcher(batch_size=3).transform_dataset(examples))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (3, 48, 64, 1)
    assert batches[1]["image"].shape == (1, 48, 64, 1)

    back = list(Unbatcher().transform_dataset(batches))
    assert len(back) == 4

    doubled = list(Repeater(epochs=2).transform_dataset(examples))
    assert len(doubled) == 8


def test_batcher_pads_ragged_instances(labels):
    import numpy as np
    from sleap_tpu.data.dataset_ops import Batcher

    exs = [
        {"instances": np.zeros((1, 3, 2), np.float32)},
        {"instances": np.zeros((4, 3, 2), np.float32)},
    ]
    batch = next(Batcher(batch_size=2).transform_dataset(exs))
    assert batch["instances"].shape == (2, 4, 3, 2)
    assert np.isnan(batch["instances"][0, 1:]).all()  # NaN padding


def test_split_labels_train_val(labels):
    from sleap_tpu.data.dataset_ops import split_labels_train_val

    train, val = split_labels_train_val(labels, 0.25, seed=1)
    assert len(train) == 3 and len(val) == 1
    all_idx = {lf.frame_idx for lf in train} | {lf.frame_idx for lf in val}
    assert all_idx == {0, 1, 2, 3}


def test_group_examples():
    from sleap_tpu.data.dataset_ops import group_examples, group_examples_iter

    exs = [
        {"video_ind": np.array([0]), "frame_ind": np.array([0]), "x": 1},
        {"video_ind": np.array([0]), "frame_ind": np.array([0]), "x": 2},
        {"video_ind": np.array([0]), "frame_ind": np.array([1]), "x": 3},
        {"video_ind": np.array([1]), "frame_ind": np.array([0]), "x": 4},
    ]
    grouped = group_examples(exs)
    assert [e["x"] for e in grouped[(0, 0)]] == [1, 2]
    assert [e["x"] for e in grouped[(1, 0)]] == [4]

    keys = [k for k, _ in group_examples_iter(exs)]
    assert keys == [(0, 0), (0, 1), (1, 0)]
    sizes = [len(b) for _, b in group_examples_iter(exs)]
    assert sizes == [2, 1, 1]
