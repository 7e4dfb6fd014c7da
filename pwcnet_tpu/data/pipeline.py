"""Host-side input pipeline: threaded prefetching, fixed-shape collation,
per-host sharding, deterministic resume.

The reference uses fork()ed ``DataLoader`` workers doing decode+crop on CPU
(SURVEY.md §3.1). Here the host pipeline only decodes and collates to a
fixed shape; random augmentation happens on device inside the jitted step.
Sampling is deterministic in (seed, step) so a resumed run sees the same
stream (SURVEY.md §7 hard part #4); each host reads only its own shard of
every global batch.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from pwcnet_tpu.data.base import FlowDataset


def _fit_to_shape(sample: Dict[str, np.ndarray],
                  hw: Tuple[int, int]) -> Dict[str, np.ndarray]:
    """Pad (bottom/right, zeros + invalid mask) or center-crop to ``hw``.

    Keeps shapes static for XLA. Padding marks pixels invalid so losses and
    EPE ignore them.
    """
    h, w = sample["im1"].shape[:2]
    th, tw = hw
    out = dict(sample)
    if h > th or w > tw:
        y0 = max((h - th) // 2, 0)
        x0 = max((w - tw) // 2, 0)
        for k in ("im1", "im2", "flow", "valid"):
            out[k] = out[k][y0:y0 + min(th, h), x0:x0 + min(tw, w)]
        h, w = out["im1"].shape[:2]
    if h < th or w < tw:
        pad_hw = ((0, th - h), (0, tw - w))
        for k in ("im1", "im2", "flow"):
            out[k] = np.pad(out[k], pad_hw + ((0, 0),))
        out["valid"] = np.pad(out["valid"], pad_hw)
    return out


class Loader:
    """Deterministic, threaded, infinite batch iterator.

    Yields numpy dicts with leading dim = per-host batch. Global batch b at
    step s draws global sample indices
    ``perm_epoch[s*b : (s+1)*b]`` under a (seed, epoch)-keyed permutation;
    this host materializes rows ``[rank*b_local : (rank+1)*b_local)``.
    """

    def __init__(self, dataset: FlowDataset, global_batch: int,
                 sample_hw: Tuple[int, int], seed: int = 0,
                 num_threads: int = 8, start_step: int = 0,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 4):
        if global_batch % process_count:
            raise ValueError("global batch must divide across hosts")
        self.dataset = dataset
        self.global_batch = global_batch
        self.local_batch = global_batch // process_count
        self.sample_hw = sample_hw
        self.seed = seed
        self.rank = process_index
        self.step = start_step
        self._steps_per_epoch = max(len(dataset) // global_batch, 1)
        self._num_threads = num_threads
        self._pool = ThreadPoolExecutor(
            max_workers=num_threads, thread_name_prefix="pwcnet-loader")
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _indices_for_step(self, step: int) -> np.ndarray:
        epoch, pos = divmod(step, self._steps_per_epoch)
        rng = np.random.default_rng((self.seed, epoch))
        perm = rng.permutation(len(self.dataset))
        start = pos * self.global_batch
        g = perm[start:start + self.global_batch]
        if g.size < self.global_batch:  # tail wrap (tiny datasets)
            g = np.concatenate([g, perm[:self.global_batch - g.size]])
        lo = self.rank * self.local_batch
        return g[lo:lo + self.local_batch]

    def _native_batch(self, idxs: np.ndarray
                      ) -> Optional[Dict[str, np.ndarray]]:
        """Fast path: threaded C++ decode for .ppm/.ppm/.flo records
        (pwcnet_tpu/native); None when inapplicable or unavailable."""
        recs = getattr(self.dataset, "records", None)
        if recs is None:
            return None
        batch = [recs[int(i)] for i in idxs]
        if not all(r.im1.endswith(".ppm") and r.im2.endswith(".ppm")
                   and r.flow.endswith(".flo") for r in batch):
            return None
        from pwcnet_tpu import native

        if not native.available():
            return None
        return native.decode_batch(
            [r.im1 for r in batch], [r.im2 for r in batch],
            [r.flow for r in batch], self.sample_hw,
            num_threads=self._num_threads)

    def _load_batch(self, step: int) -> Dict[str, np.ndarray]:
        idxs = self._indices_for_step(step)
        nb = self._native_batch(idxs)
        if nb is not None:
            return nb
        samples = list(self._pool.map(
            lambda i: _fit_to_shape(self.dataset[int(i)], self.sample_hw),
            idxs))
        return {k: np.stack([s[k] for s in samples]).astype(np.float32)
                for k in ("im1", "im2", "flow", "valid")}

    def _producer(self) -> None:
        step = self.step
        while not self._stop.is_set():
            try:
                batch = self._load_batch(step)
            except RuntimeError:
                # close() may shut the pool down while we are mid-map;
                # only a still-live close is expected to race us.
                if self._stop.is_set():
                    return
                raise
            while not self._stop.is_set():
                try:
                    self._q.put((step, batch), timeout=0.5)
                    break
                except queue.Full:
                    continue
            step += 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        step, batch = self._q.get()
        self.step = step + 1
        return batch

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
        if not self._thread.is_alive():
            self._pool.shutdown(wait=False)


def eval_batches(dataset: FlowDataset, batch: int,
                 pad_to: Optional[Tuple[int, int]] = None,
                 limit: Optional[int] = None, div: int = 64
                 ) -> Iterator[Dict[str, np.ndarray]]:
    """Sequential full-dataset iterator for evaluation; pads every sample to
    a static shape (``pad_to`` or the max over the dataset rounded up to a
    /``div``-divisible shape) and marks padding invalid."""
    n = len(dataset) if limit is None else min(limit, len(dataset))
    if pad_to is None:
        s0 = dataset[0]
        h, w = s0["im1"].shape[:2]
        pad_to = (-(-h // div) * div, -(-w // div) * div)
    for start in range(0, n, batch):
        idxs = range(start, min(start + batch, n))
        samples = [_fit_to_shape(dataset[i], pad_to) for i in idxs]
        while len(samples) < batch:  # pad final batch with all-invalid dups
            dup = {k: v.copy() for k, v in samples[0].items()}
            dup["valid"] = np.zeros_like(dup["valid"])
            samples.append(dup)
        yield {k: np.stack([s[k] for s in samples]).astype(np.float32)
               for k in ("im1", "im2", "flow", "valid")}
