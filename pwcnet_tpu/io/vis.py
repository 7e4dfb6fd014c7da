"""Flow visualization: the Middlebury 55-bin color wheel.

Capability parity with the reference's ``vis_flow`` (reference
``flow_utils.py:~60-120``): flow -> uint8 RGB, hue encodes direction,
saturation encodes magnitude (normalized by the max magnitude in the image).
"""

from __future__ import annotations

import numpy as np

# Middlebury wheel segment lengths: RY, YG, GC, CB, BM, MR.
_SEGMENTS = (15, 6, 4, 11, 13, 6)


def make_color_wheel() -> np.ndarray:
    """Build the (55, 3) uint8 Middlebury color wheel."""
    ry, yg, gc, cb, bm, mr = _SEGMENTS
    ncols = sum(_SEGMENTS)
    wheel = np.zeros((ncols, 3), np.uint8)
    col = 0
    # RY
    wheel[col:col + ry, 0] = 255
    wheel[col:col + ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    # YG
    wheel[col:col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col:col + yg, 1] = 255
    col += yg
    # GC
    wheel[col:col + gc, 1] = 255
    wheel[col:col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    # CB
    wheel[col:col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col:col + cb, 2] = 255
    col += cb
    # BM
    wheel[col:col + bm, 2] = 255
    wheel[col:col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    # MR
    wheel[col:col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col:col + mr, 0] = 255
    return wheel


_WHEEL = make_color_wheel()


def flow_to_rgb(flow: np.ndarray, max_mag: float | None = None) -> np.ndarray:
    """Render flow (H, W, 2) as a uint8 RGB image (H, W, 3).

    ``max_mag`` overrides the per-image magnitude normalization (useful for
    consistent scaling across a video). NaNs render black.
    """
    flow = np.asarray(flow, np.float32)
    u, v = flow[..., 0].copy(), flow[..., 1].copy()
    nan = ~np.isfinite(u) | ~np.isfinite(v)
    u[nan] = 0.0
    v[nan] = 0.0

    mag = np.sqrt(u * u + v * v)
    if max_mag is None:
        max_mag = max(float(mag.max()), 1e-3)
    u = u / max_mag
    v = v / max_mag
    mag = mag / max_mag

    ncols = _WHEEL.shape[0]
    angle = np.arctan2(-v, -u) / np.pi  # in (-1, 1]
    fk = (angle + 1.0) / 2.0 * (ncols - 1)  # in [0, ncols-1]
    k0 = np.floor(fk).astype(np.int32)
    k1 = (k0 + 1) % ncols
    f = (fk - k0)[..., None]

    c0 = _WHEEL[k0].astype(np.float32) / 255.0
    c1 = _WHEEL[k1].astype(np.float32) / 255.0
    color = (1 - f) * c0 + f * c1

    # Saturate towards white for small magnitudes; darken out-of-range.
    m = np.clip(mag, 0.0, None)[..., None]
    inrange = m <= 1.0
    color = np.where(inrange, 1.0 - m * (1.0 - color), color * 0.75)
    color[nan] = 0.0
    return (255.0 * color).astype(np.uint8)


# Alias matching the reference's name.
vis_flow = flow_to_rgb
