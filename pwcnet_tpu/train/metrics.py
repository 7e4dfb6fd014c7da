"""Metrics/observability: TensorBoard scalars + flow images, JSONL mirror.

Parity with the reference's tensorboardX usage (``main.py:~160-185``:
scalar train loss, val EPE, lr; ``vis_flow`` image summaries) plus
throughput counters (pairs/sec/chip — BASELINE.json north-star metrics).
Only process 0 writes.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from pwcnet_tpu.io import flow_to_rgb


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self._is_main = jax.process_index() == 0
        self._tb = None
        self._jsonl = None
        if not self._is_main:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except ImportError:
                pass

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        if not self._is_main:
            return
        values = {k: float(v) for k, v in values.items()}
        rec = {"step": int(step), "ts": time.time(), **values}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, v, step)

    def flow_image(self, step: int, tag: str, flow: np.ndarray,
                   max_mag: Optional[float] = None) -> None:
        if not self._is_main or self._tb is None:
            return
        img = flow_to_rgb(np.asarray(flow), max_mag=max_mag)
        self._tb.add_image(tag, img, step, dataformats="HWC")

    def image(self, step: int, tag: str, img: np.ndarray) -> None:
        if not self._is_main or self._tb is None:
            return
        self._tb.add_image(tag, np.asarray(img), step, dataformats="HWC")

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
