"""Reference ``.pth`` state_dict -> flax parameter tree importer.

SURVEY.md §6 defines operational parity as "a reference checkpoint runs in
this framework"; the reference mount is empty, so this tool is keyed to the
SURVEY §2 architecture (the same channel plan encoded in
``models/pwcnet.py`` and mirrored by :mod:`pwcnet_tpu.compat.torch_ref`).
The day a real ``.pth`` appears, ``pwcnet parity --ckpt`` can consume it
immediately via :func:`import_torch_checkpoint`.

Mapping strategy (robust to module-name details):
- Keys are partitioned into the three functional groups (feature pyramid /
  flow estimators / context network) by substring match, ``module.``
  DataParallel prefixes stripped, norm-layer bookkeeping ignored.
- Within a group, conv (weight, bias) pairs keep the state_dict's insertion
  order — for the reference's plain ``nn.Sequential``/``ModuleList``
  construction that equals execution order, which is also exactly how the
  flax tree is laid out (StemConvs conv1-4 then ConvBlock_0.., estimators
  coarsest-first, context convs in order).
- Torch OIHW kernels transpose to flax HWIO; every leaf is shape-checked
  against the flax template and all mismatches are reported at once (a
  wrong estimator order, e.g., is caught by the distinct per-level input
  channel counts: 115/147/179/211/279).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

import numpy as np

__all__ = ["import_torch_state_dict", "import_torch_checkpoint"]

_IGNORED = ("num_batches_tracked", "running_mean", "running_var")

_GROUP_PATTERNS = {
    "pyramid": ("pyramid", "extractor"),
    "estimators": ("estimator",),
    "context": ("context",),
}


def _to_numpy(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv_pairs(items: Sequence[Tuple[str, np.ndarray]]
                ) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """Ordered (prefix, weight, bias) conv triples from (key, value) items."""
    by_prefix: Dict[str, Dict[str, np.ndarray]] = {}
    order: List[str] = []
    for key, val in items:
        if not key.endswith((".weight", ".bias")):
            continue
        prefix, _, kind = key.rpartition(".")
        if val.ndim not in (1, 4):
            continue  # conv weights are 4-D, biases 1-D; skip norm affines
        if prefix not in by_prefix:
            by_prefix[prefix] = {}
            order.append(prefix)
        by_prefix[prefix][kind] = val
    out = []
    for prefix in order:
        entry = by_prefix[prefix]
        if "weight" not in entry or entry["weight"].ndim != 4:
            continue
        out.append((prefix, entry["weight"],
                    entry.get("bias",
                              np.zeros(entry["weight"].shape[0], np.float32))))
    return out


def _pyramid_slots(tree: Dict) -> List[Tuple[Tuple[str, ...], ...]]:
    """Destination (kernel_path, bias_path) list, execution order."""
    name = next(k for k in tree if k.startswith("FeaturePyramidExtractor"))
    sub = tree[name]
    slots = []
    if any(k.startswith("StemConvs") for k in sub):
        stem = next(k for k in sub if k.startswith("StemConvs"))
        for i in range(1, 5):
            slots.append(((name, stem, f"conv{i}_kernel"),
                          (name, stem, f"conv{i}_bias")))
    for k in sorted((k for k in sub if k.startswith("ConvBlock")),
                    key=lambda s: int(s.rsplit("_", 1)[1])):
        slots.append(((name, k, "Conv_0", "kernel"),
                      (name, k, "Conv_0", "bias")))
    return slots


def _stack_slots(tree: Dict, head: str) -> List[Tuple[Tuple[str, ...], ...]]:
    """Slots for one estimator head or the context net, execution order."""
    sub = tree[head]
    slots = []
    if any(k.startswith("ConvStack") for k in sub):
        stack = next(k for k in sub if k.startswith("ConvStack"))
        inner = sub[stack]
        for k in sorted((k for k in inner if k.startswith("ConvBlock")),
                        key=lambda s: int(s.rsplit("_", 1)[1])):
            slots.append(((head, stack, k, "Conv_0", "kernel"),
                          (head, stack, k, "Conv_0", "bias")))
    for k in sorted((k for k in sub if k.startswith("ConvBlock")),
                    key=lambda s: int(s.rsplit("_", 1)[1])):
        slots.append(((head, k, "Conv_0", "kernel"),
                      (head, k, "Conv_0", "bias")))
    slots.append(((head, "Conv_0", "kernel"), (head, "Conv_0", "bias")))
    return slots


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _template(model) -> Dict:
    import jax
    import jax.numpy as jnp

    div = getattr(model, "pad_divisor", 64)
    x = jnp.zeros((1, div, div, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), x, x))
    return jax.tree.map(lambda s: s, shapes)["params"]


def import_torch_state_dict(state_dict, model=None, *,
                            estimator_order: str = "coarse_first") -> Dict:
    """Convert a reference torch ``state_dict`` to ``{"params": ...}``.

    Args:
      state_dict: mapping of torch parameter names to tensors/arrays.
      model: the destination :class:`~pwcnet_tpu.models.PWCNet` (defaults to
        the reference configuration).
      estimator_order: ``"coarse_first"`` (reference registration order) or
        ``"fine_first"`` for forks that build estimators finest-first.

    Returns:
      A plain nested dict usable as ``model.apply(variables, ...)``.

    Raises:
      ValueError: listing every unmatched source key, missing group, or
        shape mismatch (all at once, for actionable errors).
    """
    if model is None:
        from pwcnet_tpu.models import PWCNet
        model = PWCNet()
    template = _template(model)

    items = []
    unmatched = []
    groups: Dict[str, List[Tuple[str, np.ndarray]]] = {
        g: [] for g in _GROUP_PATTERNS}
    for key, val in state_dict.items():
        key = key.removeprefix("module.")
        if any(tok in key for tok in _IGNORED):
            continue
        arr = _to_numpy(val).astype(np.float32)
        items.append((key, arr))
        for group, pats in _GROUP_PATTERNS.items():
            if any(p in key for p in pats):
                groups[group].append((key, arr))
                break
        else:
            unmatched.append(key)

    errors = [f"unmatched source key: {k}" for k in unmatched]

    # Estimator sub-grouping by the ModuleList index embedded in the key.
    est_by_idx: Dict[int, List[Tuple[str, np.ndarray]]] = {}
    for key, arr in groups["estimators"]:
        m = re.search(r"estimators?\.(\d+)", key)
        idx = int(m.group(1)) if m else 0
        est_by_idx.setdefault(idx, []).append((key, arr))

    levels = [model.num_levels - i for i in range(model.output_level + 1)]
    if estimator_order == "fine_first":
        levels = levels[::-1]
    elif estimator_order != "coarse_first":
        raise ValueError(f"estimator_order={estimator_order!r}")

    assignments: List[Tuple[Tuple[str, ...], Tuple[str, ...],
                            np.ndarray, np.ndarray, str]] = []

    def plan(slots, pairs, what):
        if len(slots) != len(pairs):
            errors.append(
                f"{what}: {len(pairs)} source convs for {len(slots)} "
                f"destination convs")
            return
        for (kpath, bpath), (prefix, w, b) in zip(slots, pairs):
            assignments.append((kpath, bpath, w.transpose(2, 3, 1, 0), b,
                                prefix))

    plan(_pyramid_slots(template), _conv_pairs(groups["pyramid"]),
         "feature pyramid")
    for pos, idx in enumerate(sorted(est_by_idx)):
        if pos >= len(levels):
            errors.append(f"estimator index {idx}: more estimators than "
                          f"decoder levels {levels}")
            continue
        head = f"estimator_l{levels[pos]}"
        plan(_stack_slots(template, head), _conv_pairs(est_by_idx[idx]),
             head)
    if len(est_by_idx) < len(levels):
        errors.append(f"only {len(est_by_idx)} estimators in checkpoint for "
                      f"levels {levels}")
    plan(_stack_slots(template, "context"), _conv_pairs(groups["context"]),
         "context")

    params: Dict = {}
    for kpath, bpath, w, b, prefix in assignments:
        want = _shape_at(template, kpath)
        if tuple(want) != w.shape:
            errors.append(f"{prefix}: kernel {w.shape} -> "
                          f"{'/'.join(kpath)} expects {tuple(want)}")
            continue
        _set(params, kpath, w)
        _set(params, bpath, b)

    if errors:
        raise ValueError("torch import failed:\n  " + "\n  ".join(errors))
    return {"params": params}


def _shape_at(template: Dict, path: Tuple[str, ...]):
    node = template
    for p in path:
        node = node[p]
    return node.shape


def import_torch_checkpoint(path: str, model=None, **kw) -> Dict:
    """Load a ``.pth`` file (plain state_dict or common wrapper dicts)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "model_state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return import_torch_state_dict(obj, model, **kw)
