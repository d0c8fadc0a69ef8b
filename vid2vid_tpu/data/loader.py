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

    Yields dict batches of `opt.batchSize` clips stacked on a leading batch
    axis (the reference's torch DataLoader batching, which likewise requires
    per-clip shapes to match within a batch); shuffles per epoch unless
    serial_batches. A short remainder batch is yielded at epoch end.
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
        bs = max(1, self.opt.batchSize)
        pending: list[dict] = []
        try:
            while True:
                item = q.get()
                if item is None:
                    if pending:
                        yield _stack_items(pending)
                    return
                pending.append(item)
                if len(pending) == bs:
                    yield _stack_items(pending)
                    pending = []
        finally:
            stop.set()


def _stack_items(items: list[dict]) -> dict:
    """Stack per-clip dicts on a new batch axis (arrays), list the rest."""
    out = {}
    for k, v in items[0].items():
        if isinstance(v, np.ndarray):
            vs = [it[k] for it in items]
            shapes = {a.shape for a in vs}
            if len(shapes) > 1:
                raise ValueError(
                    f"cannot batch key {k!r}: per-clip shapes differ "
                    f"{sorted(shapes)} — use --batchSize 1 or a fixed-crop "
                    f"--resize_or_crop mode"
                )
            out[k] = np.stack(vs)
        elif v is None:
            out[k] = None
        else:
            out[k] = [it[k] for it in items] if len(items) > 1 else v
    return out
