"""Stem forward restructuring probe — NEGATIVE RESULT, DO NOT RUN ON TPU.

The tap-merged kernel's scratch writes straddle 128-lane register
boundaries; its Mosaic compile did not return within 25 minutes and
WEDGED the shared axon compile service for ~40+ minutes (all new
compiles queue behind it; killing the client does not cancel it). Kept
for the record with the analysis in profile_r4.md. Original intent:
merge the 3 kh-tap dots per conv
into ONE K-concatenated dot (profile_r4 attack list: the stem runs at
~29% of padded-MXU peak; hypothesis — per-dot pipeline overhead and K
under-fill dominate, so 12 dots/tile -> 4 with K 160->480 (94% of the
512-padded K) should win).

Variant (this file, forward only): conv2 and conv4 (stride-1) build a
lane-concatenated patch tensor e_cat[:, :, dy*K + :] = E[dy:dy+rows] and
do one dot against the (3K, N) trace-time weight embedding. conv1/conv3
(stride-2, parity-folded taps) keep the 3-dot form. Correctness is
asserted against the production kernel, then both are marginal-timed.

Usage: python benchmarks/stem_tapmerge_probe.py
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pwcnet_tpu.ops.pallas import stem_kernel as sk  # noqa: E402
from pwcnet_tpu.ops.pallas.stem_kernel import (  # noqa: E402
    _cdiv, _embed_s1, _embed_s2, stem_pallas)


def _stem_kernel_tm(x0_ref, x1_ref, w1_ref, w2_ref, w3_ref, w4_ref,
                    b1_ref, b2_ref, b3_ref, b4_ref, out_ref,
                    xs, e1, f1, e2, f2, e3, f3, e4, *,
                    t, g1, c1, c2, wg, h1, h2, v1, v2):
    """Tap-merged variant of stem_kernel._stem_kernel (forward only).

    e2/e4 scratch are 3x wider (lane-concat of the three row taps);
    w2/w4 arrive as single (3K, N) matrices.
    """
    i = pl.program_id(1)
    g2 = g1 // 2
    cim = 6

    def lrelu(x):
        return jnp.where(x >= 0, x, 0.1 * x)

    def rowmask(x, first_abs, valid):
        rows = x.shape[0]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) \
            + first_abs
        ok = (ridx >= 0) & (ridx < valid)
        return jnp.where(ok, x, jnp.zeros_like(x))

    def colmask(x, g, c, valid):
        if valid >= x.shape[1] * g:
            return x
        grp = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2) // c
        return jnp.where(grp * g + lane < valid, x, jnp.zeros_like(x))

    xs[:4 * t] = x0_ref[0]
    xs[4 * t:] = x1_ref[0]

    # ---- conv1 (unchanged: stride 2, 3 dots) ----
    r1 = 2 * t + 7
    k1 = (g1 + 1) * cim
    for j in range(g1 + 1):
        grp, lane = divmod(j + g1, g1)
        e1[:, :, j * cim:(j + 1) * cim] = (
            xs[:4 * t + 16, grp:grp + wg, lane * cim:(lane + 1) * cim])
    e1a = e1[...].reshape(2 * t + 8, 2, wg, k1)
    acc = jnp.zeros((r1 * wg, g1 * c1), jnp.float32)
    for u in range(3):
        sl = e1a[1:r1 + 1, 0] if u == 2 else e1a[:r1, u]
        acc = acc + jnp.dot(sl.reshape(r1 * wg, k1), w1_ref[u],
                            preferred_element_type=jnp.float32)
    res = lrelu(acc + b1_ref[...].astype(jnp.float32))
    res = rowmask(res.reshape(r1, wg, g1 * c1), 2 * i * t - 3, h1)
    res = colmask(res, g1, c1, v1)
    f1[:, 0, :] = jnp.zeros_like(f1[:, 0, :])
    f1[:, wg + 1, :] = jnp.zeros_like(f1[:, wg + 1, :])
    f1[:, 1:wg + 1, :] = res.astype(f1.dtype)

    # ---- conv2: ONE dot, taps lane-concatenated ----
    r2 = 2 * t + 5
    k2 = (g1 + 2) * c1
    for dy in range(3):
        for j in range(g1 + 2):
            grp, lane = divmod(j - 1 + g1, g1)
            e2[:, :, dy * k2 + j * c1:dy * k2 + (j + 1) * c1] = (
                f1[dy:dy + r2, grp:grp + wg,
                   lane * c1:(lane + 1) * c1])
    acc = jnp.dot(e2[...].reshape(r2 * wg, 3 * k2), w2_ref[...],
                  preferred_element_type=jnp.float32)
    res = lrelu(acc + b2_ref[...].astype(jnp.float32))
    res = rowmask(res.reshape(r2, wg, g1 * c1), 2 * i * t - 2, h1)
    res = colmask(res, g1, c1, v1)
    f2[:, 0, :] = jnp.zeros_like(f2[:, 0, :])
    f2[:, wg + 1, :] = jnp.zeros_like(f2[:, wg + 1, :])
    f2[:, 1:wg + 1, :] = res.astype(f2.dtype)

    # ---- conv3 (unchanged: stride 2, 3 dots) ----
    r3 = t + 2
    cp1 = 2 * c1
    k3 = (g2 + 1) * cp1
    for j in range(g2 + 1):
        grp, lane = divmod(j + g2, g2)
        e3[:r2, :, j * cp1:(j + 1) * cp1] = (
            f2[:r2, grp:grp + wg, lane * cp1:(lane + 1) * cp1])
    e3a = e3[...].reshape(t + 3, 2, wg, k3)
    acc = jnp.zeros((r3 * wg, g2 * c2), jnp.float32)
    for u in range(3):
        sl = e3a[1:r3 + 1, 0] if u == 2 else e3a[:r3, u]
        acc = acc + jnp.dot(sl.reshape(r3 * wg, k3), w3_ref[u],
                            preferred_element_type=jnp.float32)
    res = lrelu(acc + b3_ref[...].astype(jnp.float32))
    res = rowmask(res.reshape(r3, wg, g2 * c2), i * t - 1, h2)
    res = colmask(res, g2, c2, v2)
    f3[:, 0, :] = jnp.zeros_like(f3[:, 0, :])
    f3[:, wg + 1, :] = jnp.zeros_like(f3[:, wg + 1, :])
    f3[:, 1:wg + 1, :] = res.astype(f3.dtype)

    # ---- conv4: ONE dot, taps lane-concatenated ----
    k4 = (g2 + 2) * c2
    for dy in range(3):
        for j in range(g2 + 2):
            grp, lane = divmod(j - 1 + g2, g2)
            e4[:, :, dy * k4 + j * c2:dy * k4 + (j + 1) * c2] = (
                f3[dy:dy + t, grp:grp + wg, lane * c2:(lane + 1) * c2])
    acc = jnp.dot(e4[...].reshape(t * wg, 3 * k4), w4_ref[...],
                  preferred_element_type=jnp.float32)
    res = lrelu(acc + b4_ref[...].astype(jnp.float32))
    out_ref[0] = res.reshape(t, wg, g2 * c2).astype(out_ref.dtype)


def stem_tapmerge(im, params, t):
    n, h, w_orig, cin = im.shape
    (w1, b1), (w2, b2), (w3, b3), (w4, b4) = params
    c1, c2 = w1.shape[-1], w3.shape[-1]
    w, g1 = sk._fold_pad(w_orig, c1)
    if w != w_orig:
        im = jnp.pad(im, ((0, 0), (0, 0), (0, w - w_orig), (0, 0)))
    h1, h2 = h // 2, h // 4
    g2 = g1 // 2
    wg = (w // 2) // g1
    n_tiles = _cdiv(h2, t)

    xf = im.reshape(n, h, wg, g1 * 2 * 3)
    xf = jnp.pad(xf, ((0, 0), (6, (n_tiles + 1) * 4 * t - h - 6),
                      (1, 1), (0, 0)))

    dt = im.dtype
    wm1 = _embed_s2(w1, g1, 6).astype(dt)
    wm2 = _embed_s1(w2, g1).astype(dt).reshape(-1, g1 * c1)
    wm3 = _embed_s2(w3, g2, 2 * c1).astype(dt)
    wm4 = _embed_s1(w4, g2).astype(dt).reshape(-1, g2 * c2)
    bf = lambda b, g: jnp.tile(b.astype(jnp.float32), g).reshape(1, -1)

    blk = lambda off: pl.BlockSpec(
        (1, 4 * t, wg + 2, g1 * 6), lambda b, i, _o=off: (b, i + _o, 0, 0),
        memory_space=pltpu.VMEM)
    wspec = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_stem_kernel_tm, t=t, g1=g1, c1=c1, c2=c2,
                          wg=wg, h1=h1, h2=h2, v1=w_orig // 2,
                          v2=w_orig // 4),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * t, wg, g2 * c2), dt),
        grid=(n, n_tiles),
        in_specs=[blk(0), blk(1), wspec(wm1), wspec(wm2), wspec(wm3),
                  wspec(wm4)] + [wspec(x) for x in
                                 (bf(b1, g1), bf(b2, g1), bf(b3, g2),
                                  bf(b4, g2))],
        out_specs=pl.BlockSpec((1, t, wg, g2 * c2),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8 * t, wg + 2, g1 * 6), dt),             # xs
            pltpu.VMEM((4 * t + 16, wg, (g1 + 1) * 6), dt),      # e1
            pltpu.VMEM((2 * t + 7, wg + 2, g1 * c1), dt),        # f1
            pltpu.VMEM((2 * t + 5, wg, 3 * (g1 + 2) * c1), dt),  # e2 cat
            pltpu.VMEM((2 * t + 5, wg + 2, g1 * c1), dt),        # f2
            pltpu.VMEM((2 * t + 6, wg, (g2 + 1) * 2 * c1), dt),  # e3
            pltpu.VMEM((t + 2, wg + 2, g2 * c2), dt),            # f3
            pltpu.VMEM((t, wg, 3 * (g2 + 2) * c2), dt),          # e4 cat
        ],
        interpret=False,
    )(xf, xf, wm1, wm2, wm3, wm4,
      bf(b1, g1), bf(b2, g1), bf(b3, g2), bf(b4, g2))
    # Unfold (N, H2, wg, g2*c2) -> (N, H2, W/4, c2), crop lane-fill pad.
    out = out[:, :h2]
    out = out.reshape(n, h2, wg, g2, c2).reshape(n, h2, wg * g2, c2)
    return out[:, :, :w_orig // 4, :]


def main() -> int:
    from benchmarks.kernel_roofline import bench_marginal

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    params = ((mk(3, 3, 3, 16), mk(16)), (mk(3, 3, 16, 16), mk(16)),
              (mk(3, 3, 16, 32), mk(32)), (mk(3, 3, 32, 32), mk(32)))
    results = {}
    for hw in [(448, 1024), (384, 448)]:
        im = jnp.asarray(rng.random((2, *hw, 3)), jnp.bfloat16)
        base = np.asarray(jax.jit(
            lambda x: stem_pallas(x, params))(im), np.float32)
        entry = {}
        t_base = bench_marginal(lambda x: stem_pallas(x, params), im)
        entry["production_us"] = round(t_base * 1e6, 1)
        for t in (8, 16):
            try:
                got = np.asarray(jax.jit(
                    lambda x, t=t: stem_tapmerge(x, params, t))(im),
                    np.float32)
                err = float(np.abs(base - got).max())
                tt = bench_marginal(
                    lambda x, t=t: stem_tapmerge(x, params, t), im)
                entry[f"tapmerge_t{t}_us"] = round(tt * 1e6, 1)
                entry[f"tapmerge_t{t}_err"] = err
                print(f"{hw} t={t}: {tt*1e6:.1f} us (err {err:.4f}) vs "
                      f"production {t_base*1e6:.1f}", flush=True)
            except Exception as e:
                entry[f"tapmerge_t{t}_error"] = repr(e)[:300]
                print(f"{hw} t={t}: FAILED {e!r}"[:300], flush=True)
        results[f"{hw[0]}x{hw[1]}"] = entry
    import json
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
