"""Command-line entry points: train / evaluate / predict.

The reference drives everything through ``python main.py [train] --flags``
(``main.py:~1-90``); here:

    pwcnet train   --preset chairs-quick [section.field=value ...]
    pwcnet eval    --preset sintel-eval --ckpt runs/chairs/ckpt [...]
    pwcnet predict --ckpt runs/chairs/ckpt --im1 a.png --im2 b.png \
                   --out flow.flo [--vis flow.png]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def _load_cfg(args):
    from pwcnet_tpu.config import PRESETS, Config, apply_overrides

    cfg = PRESETS[args.preset] if args.preset else Config()
    return apply_overrides(cfg, args.overrides)


def cmd_train(args) -> int:
    from pwcnet_tpu.train.loop import train

    cfg = _load_cfg(args)
    metrics = train(cfg, max_steps=args.max_steps)
    print(json.dumps(metrics))
    return 0


def cmd_eval(args) -> int:
    import jax

    from pwcnet_tpu.data.base import get_dataset
    from pwcnet_tpu.train.checkpoint import (CheckpointManager,
                                              abstract_like)
    from pwcnet_tpu.train.evaluate import evaluate_dataset
    from pwcnet_tpu.train.loop import build_model
    from pwcnet_tpu.train.schedule import optimizer_from_config
    from pwcnet_tpu.train.state import TrainState

    cfg = _load_cfg(args)
    model = build_model(cfg)
    ds_kw = ({"hw": cfg.data.sample_hw,
              "regime": cfg.data.synthetic_regime,
              "val_length": cfg.data.synthetic_val_length}
             if cfg.data.name == "synthetic" else {})
    ds = get_dataset(cfg.data.name, cfg.data.root, split=args.split, **ds_kw)
    dummy = np.zeros((1, 64, 64, 3), np.float32)
    params = jax.jit(model.init)(jax.random.key(0), dummy, dummy)
    if args.ckpt:
        tx = optimizer_from_config(cfg.train)
        template = TrainState.create(params, tx, jax.random.key(0))
        ckpt = CheckpointManager(args.ckpt)
        params = ckpt.restore(abstract_like(template)).params
        ckpt.close()
    out = evaluate_dataset(model, params, ds, batch=cfg.data.eval_batch,
                           limit=cfg.train.eval_limit)
    print(json.dumps(out))
    return 0


def cmd_predict(args) -> int:
    import jax

    from pwcnet_tpu.data.base import read_image
    from pwcnet_tpu.io import flow_to_rgb, save_flow
    from pwcnet_tpu.train.checkpoint import (CheckpointManager,
                                              abstract_like)
    from pwcnet_tpu.train.evaluate import predict_flow
    from pwcnet_tpu.train.loop import build_model
    from pwcnet_tpu.train.schedule import optimizer_from_config
    from pwcnet_tpu.train.state import TrainState

    cfg = _load_cfg(args)
    model = build_model(cfg)
    im1, im2 = read_image(args.im1), read_image(args.im2)
    dummy = np.zeros((1, 64, 64, 3), np.float32)
    params = jax.jit(model.init)(jax.random.key(0), dummy, dummy)
    if args.ckpt:
        tx = optimizer_from_config(cfg.train)
        template = TrainState.create(params, tx, jax.random.key(0))
        ckpt = CheckpointManager(args.ckpt)
        params = ckpt.restore(abstract_like(template)).params
        ckpt.close()
    flow = predict_flow(model, params, im1, im2)
    if args.out:
        save_flow(args.out, flow)
    if args.vis:
        import imageio.v2 as imageio
        imageio.imwrite(args.vis, flow_to_rgb(flow))
    mag = float(np.sqrt((flow ** 2).sum(-1)).mean())
    print(json.dumps({"mean_flow_magnitude": mag,
                      "shape": list(flow.shape)}))
    return 0


def cmd_match(args) -> int:
    import jax

    from pwcnet_tpu.data.base import read_image
    from pwcnet_tpu.frontend import match_two_view
    from pwcnet_tpu.train.checkpoint import (CheckpointManager,
                                              abstract_like)
    from pwcnet_tpu.train.loop import build_model
    from pwcnet_tpu.train.schedule import optimizer_from_config
    from pwcnet_tpu.train.state import TrainState

    cfg = _load_cfg(args)
    model = build_model(cfg)
    im1, im2 = read_image(args.im1), read_image(args.im2)
    dummy = np.zeros((1, 64, 64, 3), np.float32)
    params = jax.jit(model.init)(jax.random.key(0), dummy, dummy)
    if args.ckpt:
        tx = optimizer_from_config(cfg.train)
        template = TrainState.create(params, tx, jax.random.key(0))
        ckpt = CheckpointManager(args.ckpt)
        params = ckpt.restore(abstract_like(template)).params
        ckpt.close()
    out = match_two_view(model, params, im1, im2,
                         grid_step=args.grid_step,
                         fb_threshold=args.fb_threshold)
    matches = np.concatenate(
        [out["pts1"], out["pts2"], out["confidence"][:, None]], axis=1)
    if args.out:
        np.savetxt(args.out, matches, fmt="%.3f",
                   header="x1 y1 x2 y2 confidence")
    print(json.dumps({
        "num_matches": int(len(matches)),
        "mean_confidence": float(out["confidence"].mean())
        if len(matches) else None,
        "median_fb_error_px": float(np.median(out["fb_error"])),
    }))
    return 0


def cmd_parity(args) -> int:
    from pwcnet_tpu.train.parity import parity_report

    cfg = _load_cfg(args)
    out = parity_report(cfg, args.im1, args.im2, gt_path=args.gt,
                        ref_flow_path=args.ref_flow, ckpt=args.ckpt,
                        sweep=args.sweep)
    print(json.dumps(out, indent=2))
    return 0


def cmd_config(args) -> int:
    cfg = _load_cfg(args)
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))
    return 0


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (set PWCNET_NO_COMPILE_CACHE=1 to
    disable). Saves minutes per invocation, especially through remote-TPU
    compile services."""
    import os

    if os.environ.get("PWCNET_NO_COMPILE_CACHE") == "1":
        return
    import jax

    path = os.environ.get(
        "PWCNET_COMPILE_CACHE",
        os.path.expanduser("~/.cache/pwcnet_tpu/xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _force_platform() -> None:
    """Honor PWCNET_PLATFORM / PWCNET_CPU_DEVICES.

    In some environments (e.g. the axon remote-TPU image) a site hook pins
    the JAX platform at interpreter startup and the JAX_PLATFORMS env var
    is ignored; ``jax.config.update`` still works before backend init.
    """
    import os

    platform = os.environ.get("PWCNET_PLATFORM")
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)
    n = os.environ.get("PWCNET_CPU_DEVICES")
    if n:
        jax.config.update("jax_num_cpu_devices", int(n))


def main(argv=None) -> int:
    _force_platform()
    _enable_compile_cache()
    parser = argparse.ArgumentParser(
        prog="pwcnet", description="TPU-native PWC-Net optical flow")
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--preset", default=None,
                       help="named config preset (see pwcnet_tpu.config)")
        p.add_argument("overrides", nargs="*",
                       help="section.field=value overrides")

    p = sub.add_parser("train", help="run training")
    common(p)
    p.add_argument("--max-steps", type=int, default=None)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="evaluate a checkpoint on a dataset")
    common(p)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--split", default="val")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("predict", help="flow for one image pair")
    common(p)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--im1", required=True)
    p.add_argument("--im2", required=True)
    p.add_argument("--out", default=None, help=".flo/.png output path")
    p.add_argument("--vis", default=None, help="color visualization path")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser(
        "match",
        help="SLAM-style sparse two-view matches (forward-backward-"
             "checked flow correspondences)")
    common(p)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--im1", required=True)
    p.add_argument("--im2", required=True)
    p.add_argument("--out", default=None,
                   help="matches text file: x1 y1 x2 y2 confidence")
    p.add_argument("--grid-step", type=int, default=8)
    p.add_argument("--fb-threshold", type=float, default=1.5)
    p.set_defaults(fn=cmd_match)

    p = sub.add_parser(
        "parity",
        help="reference-parity harness: EPE of one pair vs GT and/or a "
             "reference .flo (BASELINE config 1; PARITY.md rows 9/18)")
    common(p)
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir (orbax) or a reference torch "
                        ".pth/.pt state_dict (imported via compat/)")
    p.add_argument("--im1", required=True)
    p.add_argument("--im2", required=True)
    p.add_argument("--gt", default=None, help="ground-truth .flo")
    p.add_argument("--ref-flow", default=None,
                   help="reference implementation's predicted .flo")
    p.add_argument("--sweep", action="store_true",
                   help="report all resize_mode x input_center combinations")
    p.set_defaults(fn=cmd_parity)

    p = sub.add_parser("config", help="print the resolved config")
    common(p)
    p.set_defaults(fn=cmd_config)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
