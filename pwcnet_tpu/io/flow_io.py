"""Optical-flow file formats: Middlebury ``.flo``, ``.pfm``, KITTI 16-bit PNG.

Capability parity with the reference's ``flow_utils.py`` (reference
``flow_utils.py:~1-120``): ``load_flow``/``save_flow`` auto-dispatch on
extension; KITTI sparse ground truth decodes to ``(flow, valid)``.

All functions are pure numpy (host-side I/O layer, L0 in SURVEY.md §1);
nothing here touches JAX.
"""

from __future__ import annotations

import os
import re
from typing import Tuple

import numpy as np

FLO_MAGIC = 202021.25  # Middlebury sanity-check magic number.


# ---------------------------------------------------------------------------
# Middlebury .flo
# ---------------------------------------------------------------------------

def read_flo(path: str) -> np.ndarray:
    """Read a Middlebury ``.flo`` file -> float32 array of shape (H, W, 2)."""
    with open(path, "rb") as f:
        magic = np.frombuffer(f.read(4), np.float32)[0]
        if not np.isclose(magic, FLO_MAGIC):
            raise ValueError(f"{path}: bad .flo magic {magic!r}")
        w = int(np.frombuffer(f.read(4), np.int32)[0])
        h = int(np.frombuffer(f.read(4), np.int32)[0])
        data = np.frombuffer(f.read(h * w * 2 * 4), np.float32)
        if data.size != h * w * 2:
            raise ValueError(f"{path}: truncated .flo ({data.size} floats, "
                             f"expected {h * w * 2})")
    return data.reshape(h, w, 2).copy()


def write_flo(path: str, flow: np.ndarray) -> None:
    """Write float32 flow (H, W, 2) as Middlebury ``.flo``."""
    flow = np.asarray(flow, np.float32)
    if flow.ndim != 3 or flow.shape[-1] != 2:
        raise ValueError(f"flow must be (H, W, 2), got {flow.shape}")
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        f.write(np.float32(FLO_MAGIC).tobytes())
        f.write(np.int32(w).tobytes())
        f.write(np.int32(h).tobytes())
        f.write(flow.tobytes())


# ---------------------------------------------------------------------------
# PFM (FlyingThings3D flow / disparity)
# ---------------------------------------------------------------------------

def read_pfm(path: str) -> np.ndarray:
    """Read a ``.pfm`` file -> float32 (H, W) or (H, W, 3), top-row first."""
    with open(path, "rb") as f:
        header = f.readline().decode("latin-1").rstrip()
        if header == "PF":
            channels = 3
        elif header == "Pf":
            channels = 1
        else:
            raise ValueError(f"{path}: not a PFM file (header {header!r})")
        dims = f.readline().decode("latin-1")
        m = re.match(r"^\s*(\d+)\s+(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"{path}: malformed PFM dims {dims!r}")
        w, h = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().decode("latin-1").rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.frombuffer(f.read(), endian + "f4", count=h * w * channels)
    img = data.reshape(h, w, channels)
    # PFM stores rows bottom-to-top.
    img = np.flipud(img)
    if channels == 1:
        img = img[..., 0]
    return np.ascontiguousarray(img.astype(np.float32))


def write_pfm(path: str, img: np.ndarray, scale: float = 1.0) -> None:
    """Write float32 (H, W) or (H, W, 3) as little-endian ``.pfm``."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        header = "Pf"
    elif img.ndim == 3 and img.shape[-1] == 3:
        header = "PF"
    else:
        raise ValueError(f"image must be (H,W) or (H,W,3), got {img.shape}")
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"{header}\n{w} {h}\n{-abs(scale)}\n".encode("latin-1"))
        f.write(np.flipud(img).astype("<f4").tobytes())


# ---------------------------------------------------------------------------
# KITTI 16-bit PNG sparse flow
# ---------------------------------------------------------------------------

def read_kitti_png(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read KITTI flow PNG -> (flow (H, W, 2) float32, valid (H, W) float32).

    Encoding (KITTI devkit): 16-bit RGB PNG where
    ``u = (R - 2**15) / 64``, ``v = (G - 2**15) / 64``, ``valid = B > 0``.
    Reference: ``datasets.py:~185-230`` KITTI decode.
    """
    import cv2

    # cv2 reads BGR; IMREAD_UNCHANGED preserves uint16.
    raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if raw is None:
        raise FileNotFoundError(path)
    if raw.dtype != np.uint16 or raw.ndim != 3:
        raise ValueError(f"{path}: expected 16-bit 3-channel PNG, "
                         f"got {raw.dtype} {raw.shape}")
    bgr = raw.astype(np.float32)
    u = (bgr[..., 2] - 2.0 ** 15) / 64.0
    v = (bgr[..., 1] - 2.0 ** 15) / 64.0
    valid = (bgr[..., 0] > 0).astype(np.float32)
    flow = np.stack([u, v], axis=-1)
    # Invalid pixels carry arbitrary values; zero them for cleanliness.
    flow *= valid[..., None]
    return flow, valid


def write_kitti_png(path: str, flow: np.ndarray,
                    valid: np.ndarray | None = None) -> None:
    """Write flow (H, W, 2) [+ valid mask] as a KITTI 16-bit PNG."""
    import cv2

    flow = np.asarray(flow, np.float32)
    h, w = flow.shape[:2]
    if valid is None:
        valid = np.ones((h, w), np.float32)
    r = np.clip(flow[..., 0] * 64.0 + 2.0 ** 15, 0, 65535).astype(np.uint16)
    g = np.clip(flow[..., 1] * 64.0 + 2.0 ** 15, 0, 65535).astype(np.uint16)
    b = (np.asarray(valid) > 0).astype(np.uint16)
    bgr = np.stack([b, g, r], axis=-1)
    if not cv2.imwrite(path, bgr):
        raise IOError(f"failed to write {path}")


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def load_flow(path: str) -> np.ndarray:
    """Load flow from ``.flo`` / ``.pfm`` / KITTI ``.png`` (dense part only).

    For KITTI PNGs the validity mask is dropped; use :func:`read_kitti_png`
    when the mask is needed (the KITTI dataset loader does).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".flo":
        return read_flo(path)
    if ext == ".pfm":
        pfm = read_pfm(path)
        # FlyingThings flow PFMs are 3-channel with an unused third channel.
        return pfm[..., :2] if pfm.ndim == 3 else pfm
    if ext == ".png":
        return read_kitti_png(path)[0]
    raise ValueError(f"unknown flow format: {path}")


def save_flow(path: str, flow: np.ndarray) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".flo":
        write_flo(path, flow)
    elif ext == ".pfm":
        f3 = np.concatenate(
            [np.asarray(flow, np.float32),
             np.zeros(flow.shape[:2] + (1,), np.float32)], axis=-1)
        write_pfm(path, f3)
    elif ext == ".png":
        write_kitti_png(path, flow)
    else:
        raise ValueError(f"unknown flow format: {path}")
