"""Generic dataset/example-stream transformers.

Rebuild of ``/root/reference/sleap/nn/data/dataset_ops.py`` (Shuffler:14,
Batcher:76, Unbatcher:162, Repeater:181, Prefetcher:232, Preloader:276,
LambdaFilter:324) and ``general.py`` (KeyRenamer:9, KeyFilter:50,
KeyDeviceMover:81, LambdaMap:117) without tf.data: providers here are plain
iterables of example dicts, so each transformer is a small iterator adaptor.
The heavy per-example math runs on-chip inside the jitted train/infer step
(see :mod:`sleap_tpu.training.trainer`), which is why these stay host-side
and lightweight.
"""

from __future__ import annotations

import random
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import attr
import numpy as np

from sleap_tpu.data.prefetch import prefetch as _prefetch


@attr.s(auto_attribs=True)
class Shuffler:
    """Reshuffle examples (full-buffer shuffle; reference uses buffered)."""

    shuffle: bool = True
    buffer_size: int = 64
    seed: Optional[int] = None

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        if not self.shuffle:
            yield from examples
            return
        rng = random.Random(self.seed)
        buf: List[dict] = []
        for ex in examples:
            buf.append(ex)
            if len(buf) >= self.buffer_size:
                idx = rng.randrange(len(buf))
                buf[idx], buf[-1] = buf[-1], buf[idx]
                yield buf.pop()
        rng.shuffle(buf)
        yield from buf


@attr.s(auto_attribs=True)
class Batcher:
    """Collate example dicts into NaN-padded dense batches.

    Unlike the reference's RaggedTensor route, variable-count keys are
    padded to the batch's max (static shapes are required on TPU anyway);
    ``n_valid`` is implicit in the returned count.
    """

    batch_size: int = 4
    drop_remainder: bool = False

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        buf: List[dict] = []
        for ex in examples:
            buf.append(ex)
            if len(buf) == self.batch_size:
                yield self._collate(buf)
                buf = []
        if buf and not self.drop_remainder:
            yield self._collate(buf)

    @staticmethod
    def _collate(buf: List[dict]) -> dict:
        out: Dict[str, Any] = {}
        for key in buf[0]:
            vals = [np.asarray(ex[key]) for ex in buf]
            shapes = {v.shape for v in vals}
            if len(shapes) == 1:
                out[key] = np.stack(vals)
            else:
                rank = vals[0].ndim
                maxd = [max(v.shape[d] for v in vals) for d in range(rank)]
                padded = []
                for v in vals:
                    pad = [(0, m - s) for s, m in zip(v.shape, maxd)]
                    # -1 sentinel for integer keys (0 aliases real values like
                    # track index 0); NaN for floats, matching the ragged->
                    # dense padding contract elsewhere.
                    if np.issubdtype(v.dtype, np.floating):
                        fill = np.nan
                    elif np.issubdtype(v.dtype, np.signedinteger):
                        fill = -1
                    else:
                        fill = 0
                    padded.append(np.pad(v, pad, constant_values=fill))
                out[key] = np.stack(padded)
        return out


@attr.s(auto_attribs=True)
class Unbatcher:
    """Split batch dicts back into per-example dicts."""

    def transform_dataset(self, batches: Iterable[dict]) -> Iterator[dict]:
        for batch in batches:
            n = len(next(iter(batch.values())))
            for i in range(n):
                yield {k: v[i] for k, v in batch.items()}


@attr.s(auto_attribs=True)
class Repeater:
    """Repeat the stream ``epochs`` times (-1 = forever). The source must be
    re-iterable (a provider), not a one-shot generator."""

    repeat: bool = True
    epochs: int = -1

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        if not self.repeat:
            yield from examples
            return
        n = 0
        while self.epochs < 0 or n < self.epochs:
            yielded = False
            for ex in examples:
                yielded = True
                yield ex
            if not yielded:
                return
            n += 1


@attr.s(auto_attribs=True)
class Prefetcher:
    """Threaded producer double-buffer (reference Prefetcher:232)."""

    prefetch: bool = True
    buffer_size: int = 1

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        if not self.prefetch:
            return iter(examples)
        return _prefetch(iter(examples), buffer_size=self.buffer_size)


@attr.s(auto_attribs=True)
class Preloader:
    """Eagerly cache all examples in memory (reference Preloader:276)."""

    def transform_dataset(self, examples: Iterable[dict]) -> List[dict]:
        return list(examples)


@attr.s(auto_attribs=True)
class LambdaFilter:
    """Keep examples where ``filter_fn(example)`` is truthy."""

    filter_fn: Callable[[dict], bool] = lambda ex: True

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        return (ex for ex in examples if self.filter_fn(ex))


@attr.s(auto_attribs=True)
class KeyRenamer:
    """Rename (or copy) keys: old names in ``old_key_names`` map pairwise to
    ``new_key_names`` (reference general.py:9)."""

    old_key_names: Sequence[str] = ()
    new_key_names: Sequence[str] = ()
    drop_old: bool = True

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        for ex in examples:
            ex = dict(ex)
            for old, new in zip(self.old_key_names, self.new_key_names):
                if old in ex:
                    ex[new] = ex[old]
                    if self.drop_old and new != old:
                        del ex[old]
            yield ex


@attr.s(auto_attribs=True)
class KeyFilter:
    """Keep only ``keep_keys`` (all keys when empty)."""

    keep_keys: Sequence[str] = ()

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        keep = set(self.keep_keys)
        for ex in examples:
            yield {k: v for k, v in ex.items() if not keep or k in keep}


@attr.s(auto_attribs=True)
class LambdaMap:
    """Apply ``map_fn`` to each example (reference general.py:117)."""

    map_fn: Callable[[dict], dict] = lambda ex: ex

    def transform_dataset(self, examples: Iterable[dict]) -> Iterator[dict]:
        return (self.map_fn(ex) for ex in examples)


def split_labels_train_val(labels, validation_fraction: float, seed: Optional[int] = None):
    """Random user-labeled-frame split (reference data/training.py:14).

    Returns ``(train_labels, val_labels)``; at least one frame lands in each
    side when two or more frames exist.
    """
    from sleap_tpu.core.labels import Labels

    lfs = [lf for lf in labels if len(lf.user_instances) > 0] or list(labels)
    idx = list(range(len(lfs)))
    random.Random(seed).shuffle(idx)
    n_val = (
        min(max(1, int(round(len(lfs) * validation_fraction))), len(lfs) - 1)
        if len(lfs) > 1
        else 0
    )
    val_idx = set(idx[:n_val])
    train = Labels([lfs[i] for i in range(len(lfs)) if i not in val_idx])
    val = Labels([lfs[i] for i in sorted(val_idx)])
    return train, val


def group_examples(examples: Iterable[dict]) -> Dict[tuple, List[dict]]:
    """Group inference examples by (video_ind, frame_ind).

    Reference analog: ``/root/reference/sleap/nn/data/grouping.py:8``.
    """
    grouped: Dict[tuple, List[dict]] = {}
    for example in examples:
        key = (
            int(np.asarray(example["video_ind"]).squeeze()),
            int(np.asarray(example["frame_ind"]).squeeze()),
        )
        grouped.setdefault(key, []).append(example)
    return grouped


def group_examples_iter(examples: Iterable[dict]):
    """Stream (key, [examples]) groups over consecutive same-frame runs.

    Reference analog: ``grouping.py:22`` (assumes frame-sorted input, like
    the per-instance examples a top-down pipeline emits).
    """
    last_key, batch = None, []
    for example in examples:
        key = (
            int(np.asarray(example["video_ind"]).squeeze()),
            int(np.asarray(example["frame_ind"]).squeeze()),
        )
        if last_key != key:
            if batch:
                yield last_key, batch
            last_key, batch = key, [example]
        else:
            batch.append(example)
    if batch:
        yield last_key, batch
