"""On-device training augmentation (jitted; a TPU-first upgrade over the
reference's CPU DataLoader-worker crop, reference ``datasets.py:~1-60``).

The host pipeline transfers full-size image pairs + GT; augmentation then
runs inside the jitted train step on device: per-sample random crop,
horizontal/vertical flips (with flow sign fixups), and photometric jitter
applied to the images only (brightness / contrast / gamma / per-channel
color scale / gaussian noise — asymmetric between the two frames, matching
common PWC-Net training practice).

All shapes are static: the crop size is a config constant; per-sample
offsets are traced values consumed by ``dynamic_slice``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugmentConfig:
    crop_hw: Tuple[int, int] = (384, 448)
    hflip_prob: float = 0.5
    vflip_prob: float = 0.1
    photometric: bool = True
    brightness: float = 0.2     # additive, in [0,1] units
    contrast: float = 0.4       # multiplicative range +/-
    gamma: Tuple[float, float] = (0.7, 1.5)
    color: float = 0.3          # per-channel multiplicative range +/-
    noise_std: float = 0.02
    asymmetric_prob: float = 0.2  # chance of independent jitter per frame


def _photometric(im: jax.Array, key: jax.Array,
                 cfg: AugmentConfig) -> jax.Array:
    kb, kc, kg, kcol, kn = jax.random.split(key, 5)
    b = jax.random.uniform(kb, (), minval=-cfg.brightness,
                           maxval=cfg.brightness)
    c = 1.0 + jax.random.uniform(kc, (), minval=-cfg.contrast,
                                 maxval=cfg.contrast)
    g = jax.random.uniform(kg, (), minval=cfg.gamma[0], maxval=cfg.gamma[1])
    col = 1.0 + jax.random.uniform(kcol, (3,), minval=-cfg.color,
                                   maxval=cfg.color)
    noise = cfg.noise_std * jax.random.normal(kn, im.shape)
    mean = jnp.mean(im, axis=(0, 1), keepdims=True)
    im = (im - mean) * c + mean + b
    im = jnp.clip(im, 0.0, 1.0) ** g
    im = im * col
    return jnp.clip(im + noise, 0.0, 1.0)


def _augment_one(sample: Dict[str, jax.Array], key: jax.Array,
                 cfg: AugmentConfig) -> Dict[str, jax.Array]:
    im1, im2 = sample["im1"], sample["im2"]
    flow, valid = sample["flow"], sample["valid"]
    h, w = im1.shape[0], im1.shape[1]
    th, tw = cfg.crop_hw
    kcrop, khf, kvf, kphoto, kasym = jax.random.split(key, 5)

    # --- random crop (all tensors identically) ---
    y0 = jax.random.randint(kcrop, (), 0, max(h - th, 0) + 1)
    x0 = jax.random.randint(jax.random.fold_in(kcrop, 1), (), 0,
                            max(w - tw, 0) + 1)

    def crop(a):
        start = (y0, x0) + (0,) * (a.ndim - 2)
        size = (th, tw) + a.shape[2:]
        return jax.lax.dynamic_slice(a, start, size)

    im1, im2, flow, valid = crop(im1), crop(im2), crop(flow), crop(valid)

    # --- flips (flow components change sign along flipped axes) ---
    do_h = jax.random.bernoulli(khf, cfg.hflip_prob)
    im1, im2, valid = jax.tree.map(
        lambda a: jnp.where(do_h, jnp.flip(a, axis=1), a),
        (im1, im2, valid))
    flow = jnp.where(
        do_h, jnp.flip(flow, axis=1) * jnp.asarray([-1.0, 1.0]), flow)

    do_v = jax.random.bernoulli(kvf, cfg.vflip_prob)
    im1, im2, valid = jax.tree.map(
        lambda a: jnp.where(do_v, jnp.flip(a, axis=0), a),
        (im1, im2, valid))
    flow = jnp.where(
        do_v, jnp.flip(flow, axis=0) * jnp.asarray([1.0, -1.0]), flow)

    # --- photometric jitter (images only) ---
    if cfg.photometric:
        k1, k2, ka = jax.random.split(kphoto, 3)
        asym = jax.random.bernoulli(ka, cfg.asymmetric_prob)
        j1 = _photometric(im1, k1, cfg)
        # Symmetric: same key for both frames; asymmetric: independent.
        j2_sym = _photometric(im2, k1, cfg)
        j2_asym = _photometric(im2, k2, cfg)
        im1 = j1
        im2 = jnp.where(asym, j2_asym, j2_sym)

    return {"im1": im1, "im2": im2, "flow": flow, "valid": valid}


def augment_batch(batch: Dict[str, jax.Array], key: jax.Array,
                  cfg: AugmentConfig) -> Dict[str, jax.Array]:
    """vmapped per-sample augmentation; ``batch`` tensors are (N, H, W, ...)."""
    n = batch["im1"].shape[0]
    keys = jax.random.split(key, n)
    return jax.vmap(lambda s, k: _augment_one(s, k, cfg))(batch, keys)
