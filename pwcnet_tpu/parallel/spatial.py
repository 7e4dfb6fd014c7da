"""Spatial (image-H) sharding — the sequence/context-parallel analog for
conv/correlation nets (SURVEY.md §2b "SP/CP").

Two cooperating mechanisms:
- **GSPMD** partitions the convolutions: the forward runs under ``jit``
  with images sharded over the ``spatial`` mesh axis (H) and params
  replicated; XLA inserts the conv boundary collectives automatically —
  the scaling-book recipe: annotate shardings, let XLA insert collectives.
- **shard_map + ppermute halo islands** handle warp + correlation
  (``pwcnet_tpu/parallel/halo.py``): a Pallas custom call is opaque to
  GSPMD, so with ``corr_backend='pallas'`` the model is given
  ``spatial_axis`` and each level's warp+corr runs shard-locally on
  ring-exchanged halo rows. The ``lax`` backend needs no islands (its
  pad/slice/mul/reduce ops are all GSPMD-partitionable).

Use cases: full-resolution Sintel/KITTI inference whose activations
don't fit one chip, and latency scaling of single-pair inference. DP
training keeps the shard_map + Pallas path (``pwcnet_tpu/train/step.py``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pwcnet_tpu.models import PWCNet
from pwcnet_tpu.parallel.mesh import SPATIAL_AXIS


def spatial_image_sharding(mesh: Mesh) -> NamedSharding:
    """(N, H, W, C) images sharded along H over the spatial axis."""
    return NamedSharding(mesh, P(None, SPATIAL_AXIS))


def required_divisor(model: PWCNet, mesh: Mesh) -> int:
    """H must be divisible by (2**num_levels) * spatial_size so every
    pyramid level splits evenly across the spatial shards."""
    s = mesh.shape[SPATIAL_AXIS]
    return (2 ** model.num_levels) * s


def spatial_forward(model: PWCNet, params, mesh: Mesh,
                    im1: jax.Array, im2: jax.Array
                    ) -> Tuple[List[jax.Array], jax.Array]:
    """Run the forward with H sharded over the spatial mesh axis.

    Returns (per-level flows, full-res pixel flow), both replicated.
    ``im1``/``im2``: (N, H, W, 3) with H divisible by
    :func:`required_divisor`.

    ``corr_backend='pallas'`` runs the production kernel shard-locally via
    the halo-exchange islands (``parallel/halo.py``); ``'lax'`` runs pure
    GSPMD. NOTE the halo contract: per level the warp's vertical reach
    across a shard edge is bounded by ``model.spatial_halo`` rows.
    """
    from pwcnet_tpu.parallel.mesh import SPATIAL_AXIS as _SP
    if model.corr_backend in ("pallas", "fused") and model.spatial_axis is None:
        model = dataclasses.replace(model, spatial_axis=_SP)
    h = im1.shape[1]
    div = required_divisor(model, mesh)
    if h % div:
        raise ValueError(
            f"H={h} must be divisible by {div} for spatial sharding "
            f"(2**num_levels * spatial shards); pad the images")

    im_sh = spatial_image_sharding(mesh)
    rep = NamedSharding(mesh, P())
    im1 = jax.device_put(im1, im_sh)
    im2 = jax.device_put(im2, im_sh)
    params = jax.device_put(params, rep)

    @jax.jit
    def fwd(params, a, b):
        flows = model.apply(params, a, b, train=False)
        full = model.full_res_flow(flows, a.shape[1:3])
        return flows, full

    # jit infers the mesh from the input NamedShardings; GSPMD propagates.
    # set_mesh provides the ambient mesh the halo shard_map islands bind to.
    with jax.set_mesh(mesh):
        flows, full = fwd(params, im1, im2)
    return flows, full


def pad_for_spatial(img: np.ndarray, model: PWCNet, mesh: Mesh
                    ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Zero-pad H (bottom) and W (right, to /2**num_levels) for
    :func:`spatial_forward`; returns padded array + original (H, W)."""
    div_h = required_divisor(model, mesh)
    div_w = 2 ** model.num_levels
    h, w = img.shape[-3:-1]
    ph = -(-h // div_h) * div_h
    pw = -(-w // div_w) * div_w
    if (ph, pw) == (h, w):
        return img, (h, w)
    pad = [(0, 0)] * (img.ndim - 3) + [(0, ph - h), (0, pw - w), (0, 0)]
    return np.pad(img, pad), (h, w)
