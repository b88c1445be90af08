"""Host-side batching: the torch DataLoader/DistributedSampler replacement.

The reference shards data with DistributedSampler and reshuffles with
``sampler.set_epoch(epoch)`` (mvuld/data/bigvul_dataset.py:163-205,
main.py:205). Here a single host feeds the whole mesh: batches are global;
``shard_batch`` splits them over the dp axis at device_put time. Epoch
shuffling is seeded with (seed, epoch) for exact reproducibility.

Two iteration modes mirror the reference:
  * train: shuffle, drop_last (global batch must divide the mesh),
  * eval: sequential, last partial batch padded + a validity mask so metric
    code can drop padding (the reference gathers all logits and slices).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np


class ArrayDataset:
    """A dataset backed by a dict of equal-length sequences / arrays, with an
    optional per-item transform (e.g. image decode + augment)."""

    def __init__(self, columns: Dict[str, Sequence],
                 transform: Optional[Callable[[Dict, np.random.RandomState], Dict]] = None):
        lens = {k: len(v) for k, v in columns.items()}
        assert len(set(lens.values())) == 1, f"ragged columns: {lens}"
        self.columns = columns
        self.transform = transform
        self.n = next(iter(lens.values()))

    def __len__(self) -> int:
        return self.n

    def get(self, idx: int, rng: Optional[np.random.RandomState] = None) -> Dict:
        item = {k: v[idx] for k, v in self.columns.items()}
        if self.transform is not None:
            item = self.transform(item, rng or np.random.RandomState(0))
        return item


def _collate(items) -> Dict[str, np.ndarray]:
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        out[k] = np.stack(vals) if isinstance(vals[0], np.ndarray) else np.asarray(vals)
    return out


def train_batches(ds: ArrayDataset, batch_size: int, epoch: int,
                  seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.RandomState(seed + epoch * 1000003)
    order = rng.permutation(len(ds))
    n_batches = len(ds) // batch_size
    for b in range(n_batches):
        idx = order[b * batch_size:(b + 1) * batch_size]
        yield _collate([ds.get(int(i), rng) for i in idx])


def eval_batches(ds: ArrayDataset, batch_size: int
                 ) -> Iterator[Dict[str, np.ndarray]]:
    n_batches = math.ceil(len(ds) / batch_size)
    for b in range(n_batches):
        idx = list(range(b * batch_size, min((b + 1) * batch_size, len(ds))))
        items = [ds.get(i) for i in idx]
        batch = _collate(items)
        valid = np.zeros(batch_size, np.float32)
        valid[: len(idx)] = 1.0
        if len(idx) < batch_size:           # pad to static shape
            pad = batch_size - len(idx)
            batch = {k: np.concatenate([v] + [v[-1:]] * pad) for k, v in batch.items()}
        batch["_valid"] = valid
        yield batch


def steps_per_epoch(n: int, batch_size: int) -> int:
    return n // batch_size


class Prefetcher:
    """Background-thread prefetch over a batch iterator.

    The torch DataLoader(num_workers=8) equivalent for this single-host
    pipeline (reference: mvuld/data/bigvul_dataset.py:177-205): a producer
    thread pulls from ``it``, applies ``place_fn`` (augmentation +
    ``shard_batch``'s device_put), and keeps up to ``depth`` device-ready
    batches queued — so host input work overlaps device compute instead of
    serializing with it. Exceptions propagate to the consumer.
    """

    _SENTINEL = object()

    def __init__(self, it, place_fn: Optional[Callable] = None,
                 depth: int = 2):
        import queue
        import threading
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err = None
        self.produced = 0          # observable progress (tests)

        def run():
            try:
                for item in it:
                    self._q.put(place_fn(item) if place_fn else item)
                    self.produced += 1
            except BaseException as e:   # noqa: BLE001 — propagate to consumer
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item
