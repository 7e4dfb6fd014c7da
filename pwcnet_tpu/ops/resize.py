"""Bilinear resize with an explicit corner-alignment convention.

PARITY.md row 9: the reference (PyTorch) family's upsampling semantics
depend on ``align_corners``, whose *default changed across torch
versions* — and the reference mount is empty, so the fork's convention is
unverifiable today. This module isolates the choice behind a flag so a
one-line config flip (``model.resize_mode=align_corners``) restores
parity the day a reference checkpoint exists.

- ``half_pixel`` (default): source coord = (i + 0.5) * scale - 0.5,
  edge-clamped — torch ``align_corners=False`` / ``jax.image.resize``.
- ``align_corners``: source coord = i * (in-1)/(out-1) — torch
  ``align_corners=True``. Implemented as two dense separable
  interpolation matmuls (H_out x H_in and W_out x W_in weight matrices,
  trace-time constants): on TPU this rides the MXU instead of a gather,
  and the matrices are tiny at flow-upsampling shapes.

Both variants are pinned against ``torch.nn.functional.interpolate`` in
``tests/test_resize.py``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

RESIZE_MODES = ("half_pixel", "align_corners")


def _interp_matrix(n_in: int, n_out: int) -> jax.Array:
    """(n_out, n_in) align-corners 1-D linear-interpolation weight matrix
    (half_pixel resizes go through jax.image.resize instead)."""
    if n_out > 1:
        src = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) /
                                                      (n_out - 1))
    else:
        src = jnp.zeros((1,), jnp.float32)
    i0 = jnp.clip(jnp.floor(src), 0, n_in - 1).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n_in - 1)
    w1 = src - i0.astype(jnp.float32)
    rows = jnp.arange(n_out)
    a = jnp.zeros((n_out, n_in), jnp.float32)
    return a.at[rows, i0].add(1.0 - w1).at[rows, i1].add(w1)


def resize_bilinear(x: jax.Array, hw: Tuple[int, int],
                    mode: str = "half_pixel") -> jax.Array:
    """Bilinear-resize (N, H, W, C) -> (N, hw[0], hw[1], C)."""
    if mode not in RESIZE_MODES:
        raise ValueError(f"resize mode must be one of {RESIZE_MODES}, "
                         f"got {mode!r}")
    n, h, w, c = x.shape
    ho, wo = hw
    if (ho, wo) == (h, w):
        return x
    if mode == "half_pixel":
        return jax.image.resize(x, (n, ho, wo, c), method="bilinear")
    ay = _interp_matrix(h, ho)
    ax = _interp_matrix(w, wo)
    y = jnp.einsum("ph,nhwc->npwc", ay, x.astype(jnp.float32))
    y = jnp.einsum("qw,npwc->npqc", ax, y)
    return y.astype(x.dtype)
