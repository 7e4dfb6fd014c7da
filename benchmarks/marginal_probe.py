import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup): r = fn(*args)
    float(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = fn(*args)
    float(r)
    return (time.perf_counter() - t0) / iters

SCAN = 10
rng = np.random.default_rng(0)
from pwcnet_tpu.models import PWCNet
h, w = 448, 1024
im1 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
im2 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)

for backend in ("pallas", "lax"):
    model = PWCNet(corr_backend=backend, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    def make(reps):
        @jax.jit
        def f(params, a, b):
            def body(c, _):
                cc = c
                for _ in range(reps):
                    flows = model.apply(params, a + cc, b, train=False)
                    cc = jnp.max(flows[-1]) * 1e-9
                return cc, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN)
            return c
        return f
    t1 = bench(make(1), params, im1, im2) / SCAN
    t2 = bench(make(2), params, im1, im2) / SCAN
    print(f"{backend:6s}: 1x {1e3*t1:7.3f} ms, 2x {1e3*t2:7.3f} ms -> marginal fwd "
          f"{1e3*(t2-t1):7.3f} ms = {1/(t2-t1):6.1f} fps(marginal)")
