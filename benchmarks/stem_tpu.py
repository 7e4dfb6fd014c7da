import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pwcnet_tpu.ops.pallas.stem_kernel import stem_pallas, stem_ref

def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup): r = fn(*args)
    float(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = fn(*args)
    float(r)
    return (time.perf_counter() - t0) / iters

SCAN = 10
rng = np.random.default_rng(0)
mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
p = ((mk(3,3,3,16), mk(16)), (mk(3,3,16,16), mk(16)),
     (mk(3,3,16,32), mk(32)), (mk(3,3,32,32), mk(32)))

for hw in [(448, 1024), (384, 448)]:
    x = jnp.asarray(rng.random((2, *hw, 3)), jnp.bfloat16)
    for name, op in [("pallas", lambda v: stem_pallas(v, p)),
                     ("xla   ", lambda v: stem_ref(v, p))]:
        @jax.jit
        def f(x, op=op):
            def body(c, _):
                y = op(x + c.astype(x.dtype))
                return jnp.max(y).astype(jnp.float32) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN)
            return c
        t = bench(f, x) / SCAN
        print(f"stem {name} @{hw}: {1e6*t:8.1f} us")
