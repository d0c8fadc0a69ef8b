"""Dataset factory + prefetching loader.

`create_dataset` dispatches on --dataset_mode like the reference factory
(reference: data/custom_dataset_data_loader.py:5-45). The loader is a
thread-pool prefetcher: host-side PIL/numpy decoding overlaps device
compute (the reference used torch DataLoader worker processes; threads
suffice here because decode releases the GIL inside PIL, and the native
C++ decode path can slot under the same interface).
"""

from __future__ import annotations

import queue
import random
import threading
from collections.abc import Iterator

import numpy as np


def create_dataset(opt):
    mode = opt.dataset_mode
    if mode == "temporal":
        from vid2vid_tpu.data.temporal import TemporalDataset

        return TemporalDataset(opt)
    if mode == "face":
        from vid2vid_tpu.data.face import FaceDataset

        return FaceDataset(opt)
    if mode == "pose":
        from vid2vid_tpu.data.pose import PoseDataset

        return PoseDataset(opt)
    if mode == "test":
        from vid2vid_tpu.data.temporal import TestTemporalStream

        return TestTemporalStream(opt)
    raise ValueError(f"unknown dataset_mode {mode!r}")


def create_test_stream(opt):
    """Streaming per-frame test feed for any dataset mode."""
    if opt.dataset_mode in ("temporal", "test"):
        from vid2vid_tpu.data.temporal import TestTemporalStream

        return TestTemporalStream(opt)
    if opt.dataset_mode == "face":
        from vid2vid_tpu.data.face import FaceTestStream

        return FaceTestStream(opt)
    if opt.dataset_mode == "pose":
        from vid2vid_tpu.data.pose import PoseTestStream

        return PoseTestStream(opt)
    raise ValueError(f"no test stream for dataset_mode {opt.dataset_mode!r}")


class PrefetchLoader:
    """Index-sampling loader with background prefetch threads.

    Yields dataset items with a leading batch axis of 1 (the reference's
    canonical batchSize for video training); shuffles per epoch unless
    serial_batches.
    """

    def __init__(self, dataset, opt, n_prefetch: int = 2):
        self.dataset = dataset
        self.opt = opt
        self.n_prefetch = max(1, n_prefetch if opt.nThreads > 0 else 1)

    def __len__(self):
        return min(len(self.dataset), self.opt.max_dataset_size)

    def _order(self):
        idx = list(range(len(self)))
        if not self.opt.serial_batches:
            random.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[dict]:
        order = self._order()
        q: queue.Queue = queue.Queue(maxsize=self.n_prefetch)
        stop = threading.Event()

        def worker():
            for i in order:
                if stop.is_set():
                    return
                q.put(self.dataset[i])
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield _add_batch_axis(item)
        finally:
            stop.set()


def _add_batch_axis(item: dict) -> dict:
    out = {}
    for k, v in item.items():
        if isinstance(v, np.ndarray):
            out[k] = v[None]
        else:
            out[k] = v
    return out
