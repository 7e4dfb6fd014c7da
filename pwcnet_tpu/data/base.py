"""Dataset base: sample records, deterministic splits, crop/resize.

Capability parity with the reference's ``datasets.py:~1-60`` (``BaseDataset``
+ ``get_dataset`` registry): each dataset enumerates (im1, im2, flow[, valid])
file tuples; ``__getitem__`` decodes to float32 numpy; train/val split is
deterministic. Cropping/resizing for *evaluation* happens host-side here;
*training* augmentation (random crop/flip/photometric) runs on device
(``pwcnet_tpu/data/augment.py`` — a TPU-first upgrade over the reference's
CPU worker augmentation).
"""

from __future__ import annotations

import abc
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def read_image(path: str) -> np.ndarray:
    """Read an image file -> float32 RGB (H, W, 3) in [0, 1]."""
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32)


@dataclass(frozen=True)
class SampleRecord:
    """Paths for one training pair; ``flow`` may carry a validity channel
    (KITTI PNG)."""
    im1: str
    im2: str
    flow: str


def center_crop(arrs: Sequence[np.ndarray],
                hw: Tuple[int, int]) -> List[np.ndarray]:
    h, w = arrs[0].shape[:2]
    th, tw = hw
    y0 = max((h - th) // 2, 0)
    x0 = max((w - tw) // 2, 0)
    return [a[y0:y0 + th, x0:x0 + tw] for a in arrs]


def resize_sample(im: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    import cv2

    return cv2.resize(im, (hw[1], hw[0]), interpolation=cv2.INTER_LINEAR)


def resize_flow(flow: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Resize dense flow, rescaling magnitudes with the spatial ratio."""
    import cv2

    h, w = flow.shape[:2]
    out = cv2.resize(flow, (hw[1], hw[0]), interpolation=cv2.INTER_LINEAR)
    out = out * np.asarray([hw[1] / w, hw[0] / h], np.float32)
    return out


class FlowDataset(abc.ABC):
    """Enumerable flow dataset yielding decoded numpy samples.

    Subclasses populate ``self.records`` in ``__init__``.
    """

    records: List[SampleRecord]

    def __len__(self) -> int:
        return len(self.records)

    @abc.abstractmethod
    def _load(self, rec: SampleRecord) -> Dict[str, np.ndarray]:
        ...

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        """Returns dict with im1, im2 (H, W, 3) f32 in [0,1]; flow (H, W, 2)
        f32 pixels; valid (H, W) f32 (all-ones when GT is dense)."""
        sample = self._load(self.records[idx])
        if "valid" not in sample:
            sample["valid"] = np.ones(sample["flow"].shape[:2], np.float32)
        return sample

    @staticmethod
    def split_records(records: Sequence[SampleRecord], split: str,
                      val_fraction: float = 0.1,
                      seed: int = 0) -> List[SampleRecord]:
        """Deterministic train/val split (reference uses a fixed split file
        for Chairs when present; elsewhere a seeded 9:1 shuffle)."""
        if split == "all":
            return list(records)
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(records))
        n_val = max(int(len(records) * val_fraction), 1)
        chosen = idx[:n_val] if split == "val" else idx[n_val:]
        return [records[i] for i in sorted(chosen)]

    @staticmethod
    def split_groups(records: Sequence[SampleRecord],
                     keys: Sequence[str], split: str,
                     val_fraction: float = 0.1,
                     seed: int = 0) -> List[SampleRecord]:
        """Group-stable deterministic split: whole groups (e.g. Sintel
        scenes) go to train or val, never individual frames — a record-level
        split would leak val frames from training scenes and inflate val
        optimism (consecutive frames are nearly identical)."""
        if split == "all":
            return list(records)
        groups = sorted(set(keys))
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(groups))
        n_val = max(int(len(groups) * val_fraction), 1)
        val_groups = {groups[i] for i in order[:n_val]}
        want_val = split == "val"
        return [r for r, k in zip(records, keys)
                if (k in val_groups) == want_val]


_REGISTRY: Dict[str, type] = {}


def register_dataset(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        cls.name = name
        return cls
    return deco


def get_dataset(name: str, root: str, split: str = "train",
                **kwargs) -> FlowDataset:
    """Dataset factory (reference ``get_dataset`` registry dict)."""
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown dataset {name!r}; have {sorted(_REGISTRY)}") from None
    return cls(root=root, split=split, **kwargs)


def available_datasets() -> List[str]:
    return sorted(_REGISTRY)


def require_dir(path: str, what: str) -> None:
    if not os.path.isdir(path):
        raise FileNotFoundError(f"{what} directory not found: {path}")
