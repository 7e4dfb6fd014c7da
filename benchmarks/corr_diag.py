import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas, _to_cf, _from_cf
from pwcnet_tpu.ops.warp import warp_bilinear

def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup): r = fn(*args)
    float(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = fn(*args)
    float(r)
    return (time.perf_counter() - t0) / iters

SCAN = 10
rng = np.random.default_rng(0)

def scanned(op, *inp):
    @jax.jit
    def f(*inp):
        def body(c, _):
            y = op(*[v + c.astype(v.dtype) for v in inp])
            return jnp.max(y).astype(jnp.float32) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN)
        return c
    return bench(f, *inp) / SCAN

shapes = [(1, 112, 256, 32), (1, 56, 128, 64), (1, 28, 64, 96), (1, 14, 32, 128)]
tot_corr = tot_tr = tot_warp = 0
for s in shapes:
    f1 = jnp.asarray(rng.random(s), jnp.bfloat16)
    f2 = jnp.asarray(rng.random(s), jnp.bfloat16)
    flow = jnp.asarray(rng.standard_normal(s[:3] + (2,)) * 3, jnp.float32)
    t_corr = scanned(lambda a, b: cost_volume_pallas(a, b), f1, f2)
    def tr_only(a, b):
        ca, cb = _to_cf(a), _to_cf(b)
        fake = jnp.broadcast_to((ca[:, :1] + cb[:, :1]), (s[0], 81, s[1], s[2]))
        return _from_cf(fake)
    t_tr = scanned(tr_only, f1, f2)
    t_warp = scanned(warp_bilinear, f2, flow)
    tot_corr += t_corr; tot_tr += t_tr; tot_warp += t_warp
    print(f"{s}: corr {1e6*t_corr:7.1f} us | transposes-only {1e6*t_tr:7.1f} us | warp {1e6*t_warp:7.1f} us")
print(f"totals: corr {1e6*tot_corr:.0f} us, transposes {1e6*tot_tr:.0f} us, warp {1e6*tot_warp:.0f} us")
