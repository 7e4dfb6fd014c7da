"""Local cost volume (correlation layer) — lax reference implementation.

Capability parity with the reference's two correlation backends
(reference ``modules.py:~80-115`` pure-PyTorch ``CostVolumeLayer`` and
``correlation_package/correlation_cuda_kernel.cu`` CUDA kernel, params
``pad_size=4, kernel_size=1, max_displacement=4, stride1=1, stride2=1``):

    out[n, y, x, d] = (1/C) * sum_c f1[n, y, x, c] * f2[n, y+dy, x+dx, c]

for displacements (dy, dx) in [-d, d]^2, zero outside the image, giving
(2d+1)^2 = 81 output channels for d=4. Displacement channel ordering is
row-major over (dy, dx), i.e. ``d = (dy + 4) * 9 + (dx + 4)`` — matching
the CUDA kernel's ``top_channel`` layout.

This file is the *reference/fallback* implementation composed from lax
ops (pad + 81 shifted multiply-reduces — XLA fuses these well). The
production path is the Pallas kernel in ``pwcnet_tpu/ops/pallas/``,
dispatched via :func:`cost_volume` — mirroring the reference's ``--corr``
backend flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cost_volume_lax(f1: jax.Array, f2: jax.Array,
                    max_displacement: int = 4) -> jax.Array:
    """Local correlation, lax-composed. f1, f2: (N, H, W, C) -> (N, H, W, D²).

    Accumulates in float32 regardless of input dtype; returns float32 is
    avoided — output matches input dtype (bf16 in the production model)
    after the mean, like the CUDA kernel's single-precision accumulate.
    """
    if f1.shape != f2.shape:
        raise ValueError(f"shape mismatch {f1.shape} vs {f2.shape}")
    n, h, w, c = f1.shape
    d = max_displacement
    f1f = f1.astype(jnp.float32)
    f2p = jnp.pad(f2.astype(jnp.float32),
                  ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, dy + d, dx + d, 0), (n, h, w, c))
            outs.append(jnp.mean(f1f * shifted, axis=-1))
    return jnp.stack(outs, axis=-1).astype(f1.dtype)


def cost_volume_prepadded_lax(f1: jax.Array, f2e: jax.Array,
                              max_displacement: int = 4) -> jax.Array:
    """Correlation where ``f2e`` carries ``d`` extra REAL rows on each side
    (halo rows from ring neighbors in the spatially-sharded path,
    ``pwcnet_tpu/parallel/halo.py``) instead of zero padding.

    f1: (N, H, W, C); f2e: (N, H + 2d, W, C) covering rows [-d, H+d).
    """
    n, h, w, c = f1.shape
    d = max_displacement
    if f2e.shape[1] != h + 2 * d:
        raise ValueError(
            f"f2e must have H + 2d = {h + 2 * d} rows, got {f2e.shape[1]}")
    f1f = f1.astype(jnp.float32)
    f2p = jnp.pad(f2e.astype(jnp.float32), ((0, 0), (0, 0), (d, d), (0, 0)))
    outs = []
    for dy in range(2 * d + 1):
        for dx in range(2 * d + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, dy, dx, 0), (n, h, w, c))
            outs.append(jnp.mean(f1f * shifted, axis=-1))
    return jnp.stack(outs, axis=-1).astype(f1.dtype)


def cost_volume_prepadded(f1: jax.Array, f2e: jax.Array, *,
                          max_displacement: int = 4,
                          backend: str = "lax") -> jax.Array:
    """Backend dispatch for the halo-prepadded correlation."""
    if backend == "lax":
        return cost_volume_prepadded_lax(f1, f2e, max_displacement)
    if backend == "pallas":
        from pwcnet_tpu.ops.pallas.cost_volume_kernel import (
            cost_volume_pallas_prepadded)
        return cost_volume_pallas_prepadded(
            f1, f2e, max_displacement=max_displacement)
    raise ValueError(f"unknown cost-volume backend {backend!r}")


@functools.partial(jax.jit,
                   static_argnames=("max_displacement", "backend", "bwd"))
def cost_volume(f1: jax.Array, f2: jax.Array, *,
                max_displacement: int = 4,
                backend: str = "lax", bwd: str = "auto") -> jax.Array:
    """Dispatching cost-volume entry point (analog of the reference ``--corr``).

    backend: 'lax' (XLA-composed reference) | 'pallas' (hand-written TPU
    kernel with custom VJP, pwcnet_tpu/ops/pallas/cost_volume_kernel.py).
    bwd (pallas only): 'auto' routes the backward to the Pallas kernels
    whenever their tiles fit VMEM; 'lax' forces the lax-autodiff
    backward. Measured r5: 'auto' wins the PWC train graph by 2.2
    ms/step, while RAFT's in-scan W=32 C=128 lookups run 3.1 ms/step
    faster with 'lax' — so each model family pins its measured choice.
    """
    if backend == "lax":
        return cost_volume_lax(f1, f2, max_displacement)
    if backend == "pallas":
        from pwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas
        return cost_volume_pallas(f1, f2, max_displacement=max_displacement,
                                  bwd=bwd)
    raise ValueError(f"unknown cost-volume backend {backend!r}")
