"""RAFT-style iterative refinement head (BASELINE.json stretch config 4).

A TPU-first take on RAFT (Teed & Deng, ECCV 2020): instead of
materializing the O((HW)^2) all-pairs correlation volume and gathering
windows from it, each iteration warps the frame-2 features by the current
flow estimate and computes a *local* correlation — mathematically the same
lookup values, computed on the fly (the memory-efficient formulation) and
**sharing the Pallas cost-volume kernel** with PWC-Net
(``pwcnet_tpu/ops/pallas/cost_volume_kernel.py``). Two correlation scales
(1/8 and 1/16 features) stand in for RAFT's 4-level lookup pyramid.

The recurrent update (context encoder, separable ConvGRU, flow head) runs
under ``lax.scan`` — weights shared across iterations, compiled once,
TPU-friendly static iteration count.

Flow convention: the GRU refines flow in pixels at 1/8 resolution; each
iteration's estimate is lifted to full resolution by RAFT's **convex
upsampling** (a learned softmax-weighted combination of the 3x3 coarse
neighborhood per 8x8 subpixel), so the model returns one *full-resolution*
pixel flow per iteration (for the exponentially-weighted sequence loss,
``pwcnet_tpu.losses.sequence_loss``). ``full_res_flow`` is then a no-op
pass-through kept for family-generic callers.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pwcnet_tpu.models.layers import leaky_relu
from pwcnet_tpu.models.pwcnet import resize_to
from pwcnet_tpu.ops.cost_volume import cost_volume
from pwcnet_tpu.ops.warp import warp_bilinear_from_table, warp_table


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", dtype=self.dtype)(x)
        y = leaky_relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype)(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        dtype=self.dtype)(x)
        return leaky_relu(x + y)


class RAFTEncoder(nn.Module):
    """Residual encoder to 1/8 resolution, ``dim`` channels."""

    dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (7, 7), strides=(2, 2), padding="SAME",
                    dtype=self.dtype)(x)  # 1/2
        x = leaky_relu(x)
        x = ResBlock(48, stride=2, dtype=self.dtype)(x)   # 1/4
        x = ResBlock(self.dim, stride=2, dtype=self.dtype)(x)  # 1/8
        x = ResBlock(self.dim, dtype=self.dtype)(x)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype)(x)


class SepConvGRU(nn.Module):
    """RAFT's separable ConvGRU: a 1x5 pass then a 5x1 pass.

    The z and r gates read the SAME input, so their convs are one conv
    with concatenated output channels (a convolution is linear in its
    output-channel axis — bitwise-identical math given [Wz | Wr]).
    ``fuse_zr=False`` keeps the textbook two-conv form for A/B timing
    (``benchmarks/gru_fuse_ab.py``); exact equivalence under kernel
    concatenation is pinned by tests/test_raft.py.
    """

    hidden: int = 96
    dtype: Any = jnp.float32
    # Default decided by the measured interleaved A/B
    # (benchmarks/gru_fuse_ab.py); exactness is not at stake either way.
    fuse_zr: bool = False

    @nn.compact
    def __call__(self, h, x):
        for ks in [(1, 5), (5, 1)]:
            hx = jnp.concatenate([h, x], axis=-1)
            if self.fuse_zr:
                zr = nn.Conv(2 * self.hidden, ks, padding="SAME",
                             dtype=self.dtype)(hx)
                z = nn.sigmoid(zr[..., :self.hidden])
                r = nn.sigmoid(zr[..., self.hidden:])
            else:
                z = nn.sigmoid(nn.Conv(self.hidden, ks, padding="SAME",
                                       dtype=self.dtype)(hx))
                r = nn.sigmoid(nn.Conv(self.hidden, ks, padding="SAME",
                                       dtype=self.dtype)(hx))
            q = nn.tanh(nn.Conv(self.hidden, ks, padding="SAME",
                                dtype=self.dtype)(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class MotionEncoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, corr, flow):
        c = leaky_relu(nn.Conv(96, (1, 1), dtype=self.dtype)(corr))
        c = leaky_relu(nn.Conv(64, (3, 3), padding="SAME",
                               dtype=self.dtype)(c))
        f = leaky_relu(nn.Conv(64, (7, 7), padding="SAME",
                               dtype=self.dtype)(flow.astype(self.dtype)))
        f = leaky_relu(nn.Conv(32, (3, 3), padding="SAME",
                               dtype=self.dtype)(f))
        out = jnp.concatenate([c, f], axis=-1)
        out = leaky_relu(nn.Conv(94, (3, 3), padding="SAME",
                                 dtype=self.dtype)(out))
        return jnp.concatenate([out, flow.astype(self.dtype)], axis=-1)


def convex_upsample(flow: jax.Array, mask_logits: jax.Array,
                    factor: int = 8) -> jax.Array:
    """RAFT's convex upsampling: coarse flow -> full-res pixel flow.

    Each fine pixel is a softmax-convex combination of its coarse pixel's
    3x3 neighborhood (zero-padded at borders, matching RAFT's ``F.unfold``
    with padding=1), with the flow magnitude rescaled by ``factor``.
    TPU-first formulation: 9 static pad+slice shifts + one einsum + a
    pixel-shuffle reshape — all static shapes, fuses under XLA.

    Args:
      flow: (N, h, w, 2) flow in pixels at the coarse resolution.
      mask_logits: (N, h, w, 9 * factor**2) predicted combination logits.

    Returns:
      (N, h*factor, w*factor, 2) flow in full-resolution pixels.
    """
    n, h, w, _ = flow.shape
    ff = factor * factor
    m = jax.nn.softmax(
        mask_logits.astype(jnp.float32).reshape(n, h, w, 9, ff), axis=3)
    f = flow.astype(jnp.float32) * factor
    pad = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nbrs = jnp.stack([pad[:, dy:dy + h, dx:dx + w, :]
                      for dy in range(3) for dx in range(3)], axis=3)
    up = jnp.einsum("nhwkp,nhwkc->nhwpc", m, nbrs)  # (N, h, w, ff, 2)
    up = up.reshape(n, h, w, factor, factor, 2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h * factor, w * factor, 2)


class RAFT(nn.Module):
    """Iterative two-scale local-correlation RAFT head.

    Attributes:
      num_iters: GRU refinement iterations (12 default; inference can pass
        ``num_iters`` to ``apply`` via module rebinding).
      corr_radius: local correlation max displacement at each scale.
      corr_backend: 'pallas' | 'lax' — shared with PWC-Net.
    """

    num_iters: int = 12
    corr_radius: int = 4
    feat_dim: int = 128
    hidden: int = 96
    context: int = 64
    corr_backend: str = "lax"
    gru_fuse_zr: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, im1: jax.Array, im2: jax.Array, *,
                 train: bool = True, gt: jax.Array | None = None,
                 valid: jax.Array | None = None, gamma: float = 0.8,
                 max_flow: float = 400.0):
        """Forward pass.

        Default: returns the per-iteration flow list (train=True: every
        iteration convex-upsampled to full res for the external
        ``sequence_loss``; train=False: one final full-res flow).

        With ``gt`` (train only): computes the exponentially-weighted
        sequence loss IN-SCAN — each iteration's upsampled flow is
        reduced to a masked L1 scalar inside the loop body, so the
        (iters, N, H, W, 2) stacked output tensor (25 MB at 256x256 b4)
        is never materialized, written (``dynamic_update_slice``,
        923 us/step in profile_r5) or re-read by the loss. Returns
        ``([final_full_res_flow], loss)``; the loss equals
        ``losses.sequence_loss`` on the stacked flows to fp tolerance
        (pinned by tests/test_raft.py::test_inscan_sequence_loss_exact).
        """
        div = 8
        h, w = im1.shape[1], im1.shape[2]
        # The pad divisor is 2*div = 16, NOT div: the second correlation
        # scale halves the 1/8 grid (avg_pool + flow[:, ::2, ::2]), so the
        # 1/8 dims must be even — an input with H or W = 8 (mod 16) would
        # crash at trace time (caught by
        # tests/test_evaluate_stats.py::test_predict_flow_honors_model_
        # pad_divisor).
        if h % self.pad_divisor or w % self.pad_divisor:
            raise ValueError(
                f"input H, W must be divisible by {self.pad_divisor}; "
                f"got {(h, w)}")
        im1 = im1.astype(self.dtype)
        im2 = im2.astype(self.dtype)

        n_im = im1.shape[0]
        fmap = RAFTEncoder(dim=self.feat_dim, dtype=self.dtype,
                           name="fnet")(
            jnp.concatenate([im1, im2], axis=0))
        f1, f2 = fmap[:n_im], fmap[n_im:]
        # Half-scale features for the second correlation level.
        f1h = nn.avg_pool(f1, (2, 2), strides=(2, 2))
        f2h = nn.avg_pool(f2, (2, 2), strides=(2, 2))

        ctx = RAFTEncoder(dim=self.hidden + self.context, dtype=self.dtype,
                          name="cnet")(im1)
        hidden = nn.tanh(ctx[..., :self.hidden].astype(jnp.float32))
        hidden = hidden.astype(self.dtype)
        context = leaky_relu(ctx[..., self.hidden:])

        gru = SepConvGRU(hidden=self.hidden, dtype=self.dtype,
                         fuse_zr=self.gru_fuse_zr)
        menc = MotionEncoder(dtype=self.dtype)
        head_hidden = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                              name="flow_head_1")
        head_out = nn.Conv(2, (3, 3), padding="SAME", dtype=self.dtype,
                           name="flow_head_2")
        # Convex-upsampling mask head (RAFT: conv 3x3 -> relu -> conv 1x1 to
        # 9 * 8^2 logits, scaled 0.25 for a near-uniform softmax at init).
        mask_hidden = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                              name="mask_head_1")
        mask_out = nn.Conv(9 * div * div, (1, 1), dtype=self.dtype,
                           name="mask_head_2")

        d = self.corr_radius
        # The warp gather tables depend only on the (loop-constant)
        # frame-2 features: build them ONCE here. XLA does not hoist the
        # pad/concat construction out of the scan body by itself
        # (profile_r5: ~0.27 ms/iteration of in-loop table building).
        tab_f2 = warp_table(f2)
        tab_f2h = warp_table(f2h)

        def lookup(flow):
            """Two-scale local correlation at the current flow estimate
            (shares the PWC-Net cost-volume kernel). bwd='lax': the
            in-scan W/8-wide C=128 backward kernels are idle-lane-bound
            here — measured 3.1 ms/step slower than lax autodiff at
            256x256 b4 (the opposite of the PWC train graph; see
            cost_volume docstring)."""
            w2 = warp_bilinear_from_table(tab_f2, f2.shape, flow)
            c0 = cost_volume(f1, w2, max_displacement=d,
                             backend=self.corr_backend, bwd="lax")
            w2h = warp_bilinear_from_table(tab_f2h, f2h.shape,
                                           flow[:, ::2, ::2] * 0.5)
            c1 = cost_volume(f1h, w2h, max_displacement=d,
                             backend=self.corr_backend, bwd="lax")
            # 2x nearest upsample as broadcast+reshape: jnp.repeat lowers
            # to per-channel gathers here, which made XLA materialize the
            # concat below as 162 single-channel copies (5.8 ms/frame =
            # 33% of RAFT inference device time, profile_r5.json
            # concatenate.163).
            n_, hh, hw_, cc = c1.shape
            c1_up = jnp.broadcast_to(
                c1[:, :, None, :, None, :], (n_, hh, 2, hw_, 2, cc)
            ).reshape(n_, 2 * hh, 2 * hw_, cc)
            return leaky_relu(jnp.concatenate([c0, c1_up], axis=-1))

        def upsample(hidden, flow):
            logits = 0.25 * mask_out(leaky_relu(mask_hidden(hidden)))
            return convex_upsample(flow, logits, factor=div)

        inscan = train and gt is not None
        if inscan:
            # Loop constants of the in-scan loss: the RAFT validity mask
            # (|gt| < max_flow, standard practice) and its pixel count.
            gt32 = gt.astype(jnp.float32)
            mag = jnp.sqrt(jnp.sum(gt32 ** 2, axis=-1))
            v = (mag < max_flow).astype(jnp.float32)
            if valid is not None:
                v = v * valid.astype(jnp.float32)
            v_denom = jnp.maximum(jnp.sum(v), 1.0)

        def step(carry, _):
            hidden, flow = carry
            corr = lookup(jax.lax.stop_gradient(flow))
            m = menc(corr, flow)
            x = jnp.concatenate([context, m], axis=-1)
            h_new = gru(hidden, x)
            delta = head_out(leaky_relu(head_hidden(h_new)))
            flow = flow + delta.astype(jnp.float32)
            # Per-iteration convex upsample (mask head + softmax combine +
            # full-res output) is only consumed by the training-time
            # sequence loss; inference needs just the final iteration's,
            # so the scan output stays coarse there — saves ~2.6 GFLOP of
            # mask-head convs and a full-res write per skipped iteration
            # (measured A/B: benchmarks/results/raft_profile_r5.md).
            if inscan:
                # Reduce this iteration's full-res flow to its masked L1
                # scalar right here: the upsampled map dies in-scan.
                up = upsample(h_new, flow)
                l1 = jnp.sum(jnp.abs(up - gt32), axis=-1)
                out = jnp.sum(l1 * v) / v_denom
            else:
                out = upsample(h_new, flow) if train else flow
            return (h_new, flow), out

        flow0 = jnp.zeros(f1.shape[:3] + (2,), jnp.float32)
        if self.is_initializing():
            # Run the body once unscanned so every submodule initializes
            # (including the mask head, train or not).
            (h1, f1_), _ = step((hidden, flow0), None)
            return [upsample(h1, f1_)]
        (h_last, flow_last), flows = jax.lax.scan(
            step, (hidden, flow0), None, length=self.num_iters)
        if inscan:
            # flows: (iters,) per-iteration masked-L1 scalars; apply
            # gamma^(N-1-i) (sequence_loss semantics, later iterations
            # emphasized) in one tiny reduction.
            n = self.num_iters
            w = gamma ** (n - 1 - jnp.arange(n, dtype=jnp.float32))
            return [upsample(h_last, flow_last)], jnp.sum(w * flows)
        if not train:
            return [upsample(h_last, flow_last)]
        # (iters, N, H, W, 2) full-res pixel flows -> list, iteration order.
        return [flows[i] for i in range(self.num_iters)]

    @property
    def pad_divisor(self) -> int:
        """Inputs' H and W must be divisible by this (frontend/predict
        padding): 8 for the GRU grid x2 for the half-scale correlation
        level (the 1/8 dims must be even)."""
        return 16

    def full_res_flow(self, flows: List[jax.Array],
                      hw: Tuple[int, int]) -> jax.Array:
        """Final iteration -> full-resolution pixel flow. Flows leave
        ``__call__`` already convex-upsampled; this resize is an identity
        unless a caller padded/resized the input (then it rescales to
        ``hw``). RAFT flows are in *pixels*, so under a non-uniform
        resize u and v need separate factors (W- and H-ratio) — unlike
        PWCNet's resolution-independent scaled units (VERDICT r2 weak #7:
        KITTI-style asymmetric resizes would silently corrupt v)."""
        flow = flows[-1]
        sy = hw[0] / flow.shape[1]
        sx = hw[1] / flow.shape[2]
        return resize_to(flow, hw) * jnp.asarray([sx, sy], flow.dtype)
