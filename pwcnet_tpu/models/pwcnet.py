"""PWC-Net model assembly — the whole coarse-to-fine forward is one
jittable function (no Python control flow dependent on data; the per-level
loop is unrolled at trace time, SURVEY.md §3.2).

Capability parity with the reference's ``model.py`` (``Net``) and
``modules.py`` (``FeaturePyramidExtractor``, ``OpticalFlowEstimator``,
``ContextNetwork``); layouts are NHWC, compute dtype configurable (bf16 on
TPU), correlation dispatches to the lax reference or the Pallas kernel via
``corr_backend`` (analog of the reference's ``--corr`` flag).

Flow-unit convention (documented here once, used everywhere):
  Internal per-level flows are in *scaled units* = full-resolution pixels
  divided by ``flow_scale`` (=20, the PWC-Net paper's supervision scaling).
  Scaled units are resolution-independent, so upsampling between levels is
  spatial-only. Warping at pyramid level ``l`` (1/2^l resolution) converts
  to level-l pixels with the factor ``flow_scale / 2**l``. Ground truth for
  the level-l loss is the full-res GT downsampled to level-l resolution and
  divided by ``flow_scale``. Full-resolution pixel flow at inference =
  bilinear-resize(finest flow, (H, W)) * ``flow_scale``.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pwcnet_tpu.models.layers import (ConvBlock, ConvStack, StemConvs,
                                      leaky_relu)
from pwcnet_tpu.ops.cost_volume import cost_volume
from pwcnet_tpu.ops.pallas.warp_corr_kernel import (
    fused_is_profitable as _fused_ok)
from pwcnet_tpu.ops.resize import resize_bilinear
from pwcnet_tpu.ops.warp import warp_bilinear

# Reference channel plan (reference modules.py FeaturePyramidExtractor):
# level l (1-indexed, 1/2^l resolution) -> channels. A 7th level (224) is
# provided for the reference's --num_levels=7 option.
DEFAULT_PYRAMID_CHANNELS: Tuple[int, ...] = (16, 32, 64, 96, 128, 196, 224)
# Estimator conv stack (reference modules.py OpticalFlowEstimator).
ESTIMATOR_CHANNELS: Tuple[int, ...] = (128, 128, 96, 64, 32)
# Context network (channels, dilation) pairs (reference modules.py
# ContextNetwork): final 2-channel conv has no activation.
CONTEXT_SPEC: Tuple[Tuple[int, int], ...] = (
    (128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1))


def upsample2x(x: jax.Array, mode: str = "half_pixel") -> jax.Array:
    """Bilinear 2x spatial upsample (PARITY.md row 9: alignment convention
    selectable via ``mode``; default half-pixel = torch align_corners=False)."""
    n, h, w, c = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), mode)


def resize_to(x: jax.Array, hw: Tuple[int, int],
              mode: str = "half_pixel") -> jax.Array:
    return resize_bilinear(x, hw, mode)


class FeaturePyramidExtractor(nn.Module):
    """Per-level stride-2 conv pairs producing an L-level pyramid.

    Returns features coarsest-first: ``[level_L, ..., level_min]`` where
    level l has 1/2^l the input resolution and ``channels[l-1]`` channels.
    Levels finer than ``min_level`` are omitted; when ``min_level >= 2``
    (the PWC decoder only consumes levels >= 2) and norm is off, levels
    1-2 run through the fused Pallas stem kernel
    (``pwcnet_tpu/ops/pallas/stem_kernel.py``) — level-1 features then
    never leave VMEM. Note the parameter tree differs between the fused
    (``StemConvs``) and plain (``ConvBlock``) stems.
    """

    channels: Sequence[int] = DEFAULT_PYRAMID_CHANNELS
    use_norm: bool = False
    dtype: Any = jnp.float32
    min_level: int = 1
    stem_backend: str = "auto"  # 'pallas' | 'lax' | 'auto'

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> List[jax.Array]:
        feats = []
        start = 0
        fuse_stem = (self.min_level >= 2 and not self.use_norm
                     and len(self.channels) >= 2)
        if fuse_stem:
            x = StemConvs(c1=self.channels[0], c2=self.channels[1],
                          dtype=self.dtype, backend=self.stem_backend)(
                              x, train=train)
            if self.min_level <= 2:
                feats.append(x)
            start = 2
        for ch in self.channels[start:]:
            x = ConvBlock(ch, stride=2, use_norm=self.use_norm,
                          dtype=self.dtype)(x, train=train)
            x = ConvBlock(ch, stride=1, use_norm=self.use_norm,
                          dtype=self.dtype)(x, train=train)
            if start + 1 >= self.min_level:
                feats.append(x)
            start += 1
        return feats[::-1]


class OpticalFlowEstimator(nn.Module):
    """Per-level flow head: conv stack 128-128-96-64-32 -> 2-channel flow.

    Returns (feat32, flow_delta); with ``residual`` the caller adds the
    upsampled coarser flow (reference ``--residual``).
    """

    use_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True):
        feat = ConvStack(ESTIMATOR_CHANNELS, use_norm=self.use_norm,
                         dtype=self.dtype)(x, train=train)
        flow = nn.Conv(2, (3, 3), padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32)(feat)
        return feat, flow.astype(jnp.float32)


class ContextNetwork(nn.Module):
    """Dilated-conv refinement head applied at the output level.

    ``s2b``: lower the dilated convs via space-to-batch (exact; see
    ConvBlock) — a dispatch knob for the dil-8/16 layers that XLA's
    native dilated conv runs at ~21% of MXU peak (profile_r4)."""

    s2b: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array, flow: jax.Array, *,
                 train: bool = True) -> jax.Array:
        x = jnp.concatenate([feat, flow.astype(feat.dtype)], axis=-1)
        for ch, dil in CONTEXT_SPEC:
            x = ConvBlock(ch, dilation=dil, s2b=self.s2b,
                          dtype=self.dtype)(x, train=train)
        delta = nn.Conv(2, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        return delta.astype(jnp.float32)


class PWCNet(nn.Module):
    """The full coarse-to-fine PWC-Net (reference ``model.py`` ``Net``).

    Attributes:
      num_levels: pyramid depth L (reference ``--num_levels``, default 6).
      output_level: number of coarse-to-fine refinements minus one, counted
        from the coarsest level (reference ``--output_level``, default 4):
        estimation runs at pyramid levels L .. L-output_level, so with
        L=6, output_level=4 the finest predicted flow is at level 2
        (1/4 resolution).
      search_range: correlation max displacement d (reference
        ``--search_range``, default 4 -> 81 channels).
      residual: estimator predicts an increment on the upsampled flow.
      corr_backend: 'lax' | 'pallas' | 'fused' correlation implementation
        ('fused' = single warp+corr Pallas kernel at warped levels,
        'pallas' at the top level and wherever the fused tile overflows).
      flow_scale: supervision scaling (PWC-Net paper: 20).
      spatial_axis: when set (e.g. "spatial"), the warp + correlation step
        runs as a shard_map island with lax.ppermute ring halo exchange
        over that mesh axis (``pwcnet_tpu/parallel/halo.py``) so the Pallas
        kernel works with H-sharded activations. Requires an ambient mesh
        (``jax.set_mesh``) and H divisible per parallel.spatial rules.
      spatial_halo: halo rows exchanged per level (bounds the warp's
        vertical reach across shards; see halo.py contract).
    """

    num_levels: int = 6
    output_level: int = 4
    search_range: int = 4
    residual: bool = True
    use_norm: bool = False
    input_norm: bool = False
    input_center: bool = False   # PARITY.md row 18: [0,1] -> [-1,1]
    corr_backend: str = "lax"
    stem_backend: str = "auto"
    # Per-level pixel-count crossover for the fused warp+corr dispatch
    # (None = the measured v5e default, warp_corr_kernel.FUSED_MIN_PIXELS;
    # a real config knob so other chip generations can re-tune it and the
    # multichip dryrun can exercise the fused route at toy shapes).
    fused_min_pixels: Any = None
    flow_scale: float = 20.0
    # Space-to-batch lowering for the context net's dilated convs (exact;
    # see ConvBlock.s2b). Default decided by the measured probe
    # (benchmarks/dilconv_probe.py).
    context_s2b: bool = False
    resize_mode: str = "half_pixel"  # PARITY.md row 9 (| 'align_corners')
    spatial_axis: Any = None
    spatial_halo: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, im1: jax.Array, im2: jax.Array, *,
                 train: bool = True) -> List[jax.Array]:
        """Forward pass.

        Args:
          im1, im2: (N, H, W, 3) images in [0, 1]; H, W divisible by
            2**num_levels.

        Returns:
          List of per-level flows, coarsest first, each (N, H_l, W_l, 2) in
          scaled units (full-res pixels / flow_scale); the last entry is the
          finest (level ``num_levels - output_level``) prediction.
        """
        div = 2 ** self.num_levels
        h, w = im1.shape[1], im1.shape[2]
        if h % div or w % div:
            raise ValueError(
                f"input H, W must be divisible by 2**num_levels={div}; got "
                f"{(h, w)} — pad the images (see pwcnet_tpu.train.evaluate."
                f"pad_to_divisible for the inference path)")
        chans = DEFAULT_PYRAMID_CHANNELS[:self.num_levels]
        if self.input_center:
            # PARITY row 18: some forks feed [-1, 1] images. Behind a flag
            # so a reference checkpoint can pick its convention 1:1.
            im1 = im1 * 2.0 - 1.0
            im2 = im2 * 2.0 - 1.0
        if self.input_norm:
            # Per-image standardization over spatial+channel dims.
            def norm(x):
                m = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
                s = jnp.std(x, axis=(1, 2, 3), keepdims=True) + 1e-6
                return (x - m) / s
            im1, im2 = norm(im1), norm(im2)

        im1 = im1.astype(self.dtype)
        im2 = im2.astype(self.dtype)

        extractor = FeaturePyramidExtractor(
            channels=chans, use_norm=self.use_norm, dtype=self.dtype,
            min_level=self.num_levels - self.output_level,
            stem_backend=self.stem_backend)
        # One batched extractor pass over both frames (shared weights):
        # small-channel convs starve the MXU, so doubling N is ~26% faster
        # than two calls (measured on v5e at Sintel resolution).
        n_im = im1.shape[0]
        pyr_both = extractor(jnp.concatenate([im1, im2], axis=0),
                             train=train)  # coarsest first
        pyr1 = [p[:n_im] for p in pyr_both]
        pyr2 = [p[n_im:] for p in pyr_both]

        flows: List[jax.Array] = []
        flow = None  # scaled units
        for i in range(self.output_level + 1):
            level = self.num_levels - i  # pyramid level (1/2^level res)
            f1, f2 = pyr1[i], pyr2[i]
            if flow is None:
                up_flow = jnp.zeros(f1.shape[:3] + (2,), jnp.float32)
                pix = None
            else:
                up_flow = upsample2x(flow, self.resize_mode)
                # scaled units -> pixels at this level.
                pix = up_flow * (self.flow_scale / (2.0 ** level))

            if self.spatial_axis is not None:
                # H-sharded: shard_map + ppermute halo exchange keeps the
                # Pallas kernel usable (GSPMD cannot partition it).
                from pwcnet_tpu.parallel.halo import warp_corr_spatial
                corr = warp_corr_spatial(
                    f1, f2, pix, max_displacement=self.search_range,
                    halo_rows=self.spatial_halo, axis=self.spatial_axis,
                    backend=self.corr_backend,
                    fused_min_pixels=self.fused_min_pixels)
            elif (pix is not None and self.corr_backend == "fused"
                  and _fused_ok(f1.shape[1], f1.shape[2],
                                self.fused_min_pixels)):
                # Single-kernel warp+corr: the warped tensor never leaves
                # VMEM (ops/pallas/warp_corr_kernel.py). Only at levels
                # large enough to win (measured crossover, see
                # fused_is_profitable) — small levels run composed pallas.
                from pwcnet_tpu.ops.pallas.warp_corr_kernel import (
                    warp_corr_fused)
                corr = warp_corr_fused(f1, f2, pix,
                                       max_displacement=self.search_range)
            else:
                warped2 = f2 if pix is None else warp_bilinear(f2, pix)
                backend = ("pallas" if self.corr_backend == "fused"
                           else self.corr_backend)
                corr = cost_volume(f1, warped2,
                                   max_displacement=self.search_range,
                                   backend=backend)
            corr = leaky_relu(corr)
            x = jnp.concatenate(
                [corr, f1, up_flow.astype(self.dtype)], axis=-1)
            feat, delta = OpticalFlowEstimator(
                use_norm=self.use_norm, dtype=self.dtype,
                name=f"estimator_l{level}")(x, train=train)
            flow = up_flow + delta if self.residual else delta

            if i == self.output_level:
                flow = flow + ContextNetwork(
                    s2b=self.context_s2b, dtype=self.dtype,
                    name="context")(feat, flow, train=train)
            flows.append(flow)
        return flows

    @property
    def pad_divisor(self) -> int:
        """Inputs' H and W must be divisible by this (frontend padding)."""
        return 2 ** self.num_levels

    def full_res_flow(self, flows: List[jax.Array],
                      hw: Tuple[int, int]) -> jax.Array:
        """Finest prediction -> full-resolution pixel flow (inference path,
        reference ``predict.py``: upsample finest + undo supervision scale)."""
        return resize_to(flows[-1], hw, self.resize_mode) * self.flow_scale
