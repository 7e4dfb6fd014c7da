"""Shared conv building blocks for the PWC-Net modules.

TPU-first conventions: NHWC layout, bf16 params/compute optional via the
module ``dtype`` (param_dtype stays f32; XLA casts at the matmul), LeakyReLU
slope 0.1 exactly as the reference (reference ``modules.py`` ``conv`` helper).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def leaky_relu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=0.1)


class ConvBlock(nn.Module):
    """3x3 conv (+optional stride/dilation) -> optional norm -> LeakyReLU."""

    features: int
    stride: int = 1
    dilation: int = 1
    use_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_norm:
            # The reference's --batch_norm uses torch BatchNorm2d; we use
            # GroupNorm instead: stateless (no running-stats mutable
            # collection threading through jit/shard_map), batch-size
            # independent, and TPU-friendly. Capability-equivalent
            # normalized training; documented divergence.
            groups = next(g for g in (8, 4, 2, 1) if self.features % g == 0)
            x = nn.GroupNorm(num_groups=groups, dtype=jnp.float32)(
                x.astype(jnp.float32)).astype(self.dtype)
        return leaky_relu(x)


class ConvStack(nn.Module):
    """A straight stack of ConvBlocks with given feature sizes."""

    features: Sequence[int]
    use_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        for f in self.features:
            x = ConvBlock(f, use_norm=self.use_norm, dtype=self.dtype)(
                x, train=train)
        return x
