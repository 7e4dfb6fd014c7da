"""In-graph time attribution for the Sintel-resolution inference pass.

The standalone roofline harness (`kernel_roofline.py`) carries a ~180 us
per-dispatch floor through the remote-TPU tunnel, so it cannot attribute
time *inside* the jitted model. This script ablates one component at a
time inside the same full-forward jit and reports the delta:

  full (pallas corr)     the production path
  full (lax corr)        swap the correlation backend
  corr -> stub           replace correlation with a broadcast mean (its
                         cost ~0) -> delta = in-graph correlation cost
  warp -> identity       skip the warp gather -> delta = warp cost
  pyramid only           the two feature-pyramid extractions
  batch=4 / batch=8      per-frame amortization (MXU utilization)

Usage: python benchmarks/ablate.py [H W]   (default 448 1024)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(r)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    import os

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import pwcnet_tpu.models.pwcnet as pw
    from pwcnet_tpu.models import PWCNet

    h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (448, 1024)
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
    im2 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)

    def timed_forward(model, a, b):
        @jax.jit
        def infer(params, a, b):
            flows = model.apply(params, a, b, train=False)
            return jnp.sum(model.full_res_flow(flows, (a.shape[1], a.shape[2])))
        params = jax.jit(model.init)(jax.random.key(0), a, b)
        return _bench(infer, params, a, b)

    results = {}

    model_p = PWCNet(corr_backend="pallas", dtype=jnp.bfloat16)
    results["full_pallas"] = timed_forward(model_p, im1, im2)

    model_l = PWCNet(corr_backend="lax", dtype=jnp.bfloat16)
    results["full_lax"] = timed_forward(model_l, im1, im2)

    # --- corr -> stub (keep 81 channels so estimator shapes are unchanged)
    real_cv = pw.cost_volume

    def stub_cv(f1, f2, *, max_displacement=4, backend="lax"):
        side = 2 * max_displacement + 1
        m = jnp.mean(f1 * f2, axis=-1, keepdims=True)
        return jnp.broadcast_to(m, f1.shape[:3] + (side * side,))

    pw.cost_volume = stub_cv
    try:
        results["corr_stubbed"] = timed_forward(model_p, im1, im2)
    finally:
        pw.cost_volume = real_cv

    # --- warp -> identity
    real_warp = pw.warp_bilinear
    pw.warp_bilinear = lambda f, flow: f
    try:
        results["warp_stubbed"] = timed_forward(model_p, im1, im2)
    finally:
        pw.warp_bilinear = real_warp

    # --- pyramid only
    from pwcnet_tpu.models.pwcnet import (DEFAULT_PYRAMID_CHANNELS,
                                          FeaturePyramidExtractor)
    ext = FeaturePyramidExtractor(channels=DEFAULT_PYRAMID_CHANNELS[:6],
                                  dtype=jnp.bfloat16)
    eparams = jax.jit(ext.init)(jax.random.key(0), im1)

    @jax.jit
    def pyr(eparams, a, b):
        feats = ext.apply(eparams, jnp.concatenate([a, b], axis=0))
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    results["pyramid_only"] = _bench(pyr, eparams, im1, im2)

    # --- batching
    for bs in (4, 8):
        a = jnp.asarray(rng.random((bs, h, w, 3)), jnp.float32)
        b = jnp.asarray(rng.random((bs, h, w, 3)), jnp.float32)
        results[f"full_pallas_b{bs}_perframe"] = timed_forward(model_p, a, b) / bs

    full = results["full_pallas"]
    print(f"# {h}x{w}, device={jax.devices()[0].device_kind}")
    for k, v in results.items():
        extra = ""
        if k in ("corr_stubbed", "warp_stubbed"):
            extra = f"   (component ~= {1e3 * (full - v):.2f} ms)"
        print(f"{k:28s} {1e3 * v:8.3f} ms   {1.0 / v:8.1f} fps{extra}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
