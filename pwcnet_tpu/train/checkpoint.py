"""Orbax checkpointing of the full train state (SURVEY.md §5).

Upgrades over the reference's ``torch.save(state_dict)`` every N steps
(reference ``main.py:~150-160``): atomic writes, ``max_to_keep`` retention,
auto-resume-from-latest, optimizer/PRNG/step restored exactly, and
multi-host-aware saves (Orbax coordinates across processes).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from pwcnet_tpu.train.state import TrainState


def abstract_like(state: TrainState) -> TrainState:
    """Shape/dtype/sharding-abstract copy of a (device) state pytree.

    Passing this to ``restore`` avoids fetching a full concrete template
    to host first (a ~60 MB device->host round trip through the remote-TPU
    tunnel) and makes Orbax materialize the restored arrays directly on
    device with the template's sharding.
    """
    def _abs(x):
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    return jax.tree_util.tree_map(_abs, state)


def remap_stem_params(extractor_params: dict, to_fused: bool) -> dict:
    """Convert a ``FeaturePyramidExtractor`` parameter subtree between the
    plain layout (``ConvBlock_0..``, min_level=1 or use_norm) and the fused
    layout (``StemConvs_0`` + ``ConvBlock_0..``, min_level>=2).

    The four stem convs map 1:1: ``StemConvs_0/conv{i}_kernel`` <->
    ``ConvBlock_{i-1}/Conv_0/kernel`` (same for biases); the remaining
    ConvBlocks shift index by 4. Use this to load checkpoints written with
    one layout into a model configured with the other (e.g. a round-1
    checkpoint predating the fused stem, or after an ``output_level`` /
    ``use_norm`` change; ADVICE r1 #3).
    """
    src = dict(extractor_params)
    out: dict = {}
    if to_fused:
        stem = {}
        for i in range(4):
            blk = src.pop(f"ConvBlock_{i}")["Conv_0"]
            stem[f"conv{i + 1}_kernel"] = blk["kernel"]
            stem[f"conv{i + 1}_bias"] = blk["bias"]
        out["StemConvs_0"] = stem
        for k, v in src.items():
            if k.startswith("ConvBlock_"):
                out[f"ConvBlock_{int(k.split('_')[1]) - 4}"] = v
            else:
                out[k] = v
        return out
    stem = src.pop("StemConvs_0")
    for i in range(4):
        out[f"ConvBlock_{i}"] = {"Conv_0": {
            "kernel": stem[f"conv{i + 1}_kernel"],
            "bias": stem[f"conv{i + 1}_bias"]}}
    for k, v in src.items():
        if k.startswith("ConvBlock_"):
            out[f"ConvBlock_{int(k.split('_')[1]) + 4}"] = v
        else:
            out[k] = v
    return out


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, state: TrainState, *, force: bool = False) -> bool:
        step = int(jax.device_get(state.step))
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force)
        return bool(saved)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the (possibly abstract/sharded) ``template`` pytree."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self._dir}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))

    def restore_latest_or(self, state: TrainState) -> TrainState:
        """Auto-resume: restore the latest checkpoint if one exists, else
        return ``state`` unchanged (fresh start)."""
        if self._mgr.latest_step() is None:
            return state
        return self.restore(state)

    def close(self) -> None:
        self._mgr.close()
