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

print("device:", jax.devices()[0].device_kind)
SCAN = 10

# MXU peak: 4096^3 bf16 matmul, scanned
a = jnp.ones((4096, 4096), jnp.bfloat16)
b = jnp.ones((4096, 4096), jnp.bfloat16)
@jax.jit
def mm(a, b):
    def body(c, _):
        y = jnp.dot(a * (1 + c * 1e-9), b, preferred_element_type=jnp.float32)
        return jnp.max(y) * 1e-9, None
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN)
    return c
t = bench(mm, a, b) / SCAN
fl = 2 * 4096**3
print(f"matmul 4096^3 bf16: {1e6*t:.1f} us -> {fl/t/1e12:.1f} TFLOP/s")

# HBM bandwidth: big copy-scale, scanned
x = jnp.ones((64, 1024, 1024), jnp.bfloat16)  # 128MB
@jax.jit
def cp(x):
    def body(c, _):
        y = x * (1.0 + c)
        return jnp.float32(jnp.max(y) * 1e-9), None
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN)
    return c
t = bench(cp, x) / SCAN
by = 2 * x.size * 2
print(f"scale 128MB bf16:  {1e6*t:.1f} us -> {by/t/1e9:.1f} GB/s")

# full model, scanned: true device time
from pwcnet_tpu.models import PWCNet
rng = np.random.default_rng(0)
h, w = 448, 1024
for bs in (1, 8):
    im1 = jnp.asarray(rng.random((bs, h, w, 3)), jnp.float32)
    im2 = jnp.asarray(rng.random((bs, h, w, 3)), jnp.float32)
    for backend in ("pallas", "lax"):
        model = PWCNet(corr_backend=backend, dtype=jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.key(0), im1[:1], im2[:1])
        @jax.jit
        def f(params, a, b, model=model):
            def body(c, _):
                flows = model.apply(params, a + c, b, train=False)
                return jnp.max(flows[-1]) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN)
            return c
        t = bench(f, params, im1, im2) / SCAN
        print(f"model fwd b{bs} {backend:6s}: {1e3*t:7.3f} ms = {bs/t:7.1f} fps(device)")
