"""Mesh construction and sharding helpers — the communication backend module.

The reference has no distributed layer at all (single-process CUDA,
SURVEY.md §2b); this module is its TPU-native upgrade: an explicit
``comm``/``mesh`` API wrapping JAX device meshes and XLA collectives so the
rest of the framework never touches raw collectives.

Axes:
- ``data``    — batch (DP). Primary scaling axis; gradients are psum-med
                over it by virtue of jit + NamedSharding (GSPMD inserts the
                ICI all-reduce).
- ``spatial`` — image-H sharding (the sequence/context-parallel analog for
                conv/correlation nets; halo exchange lives in
                ``pwcnet_tpu/parallel/halo.py``).
- ``model``   — reserved tensor-parallel axis, size 1 by default (PWC-Net
                is <10 M params; kept so the API is GSPMD-clean).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshConfig:
    """Sizes per axis; ``data=-1`` means "all remaining devices"."""
    data: int = -1
    spatial: int = 1
    model: int = 1


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data = cfg.data
    if data == -1:
        if n % (cfg.spatial * cfg.model):
            raise ValueError(
                f"{n} devices not divisible by spatial*model="
                f"{cfg.spatial * cfg.model}")
        data = n // (cfg.spatial * cfg.model)
    need = data * cfg.spatial * cfg.model
    if need > n:
        raise ValueError(
            f"mesh {data}x{cfg.spatial}x{cfg.model} needs {need} devices, "
            f"have {n}")
    # Fully-specified sub-meshes (e.g. tests, debugging) use the first
    # `need` devices.
    dev_array = np.asarray(devices[:need]).reshape(
        data, cfg.spatial, cfg.model)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(N, H, W, C) tensors sharded over data and spatial (H) axes."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Params / optimizer state: fully replicated (pure DP)."""
    return NamedSharding(mesh, P())


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Place a host-local pytree fully replicated over the mesh.

    Single-process: plain ``device_put``. Multi-process: ``device_put`` to a
    global sharding is illegal (it spans non-addressable devices), so the
    replicated global arrays are produced by a jit identity with explicit
    out_shardings — multi-controller SPMD semantics require every host to
    pass the same values (true for params/state created from the same seed
    or restored from the same checkpoint). Handles PRNG-key leaves, which
    ``make_array_from_process_local_data`` cannot (extended dtypes).
    """
    sharding = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.jit(lambda t: t, out_shardings=sharding)(tree)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host-local batch pytree onto the mesh, sharded over data.

    Single-process: a plain ``device_put``. Multi-host: each host passes its
    per-host shard and we assemble the global array from process-local data.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (no-op for single process; the NCCL-init
    analog — reference has none, SURVEY.md §2b)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n
