"""Benchmark dataset loaders: FlyingChairs, FlyingThings3D, Sintel, KITTI.

Capability parity with the reference's ``datasets.py`` classes
(``FlyingChairs:~60-100``, ``FlyingThings:~100-140``, ``Sintel:~140-185``,
``KITTI:~185-230``): same directory layouts, same pairing rules, KITTI
sparse ground truth decoded to (flow, valid).
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import numpy as np

from pwcnet_tpu.data.base import (
    FlowDataset,
    SampleRecord,
    read_image,
    register_dataset,
    require_dir,
)
from pwcnet_tpu.io import read_kitti_png, load_flow


@register_dataset("flyingchairs")
class FlyingChairs(FlowDataset):
    """Flat directory of ``NNNNN_img1.ppm / NNNNN_img2.ppm / NNNNN_flow.flo``.

    Split: the published ``FlyingChairs_train_val.txt`` (1=train, 2=val) when
    present next to / inside ``root``; otherwise a seeded 9:1 shuffle.
    """

    def __init__(self, root: str, split: str = "train"):
        require_dir(root, "FlyingChairs data")
        flows = sorted(glob.glob(os.path.join(root, "*_flow.flo")))
        records = []
        for fp in flows:
            stem = fp[:-len("_flow.flo")]
            records.append(SampleRecord(
                im1=stem + "_img1.ppm", im2=stem + "_img2.ppm", flow=fp))
        if not records:
            raise FileNotFoundError(f"no *_flow.flo files under {root}")

        split_file = None
        for cand in (os.path.join(root, "FlyingChairs_train_val.txt"),
                     os.path.join(os.path.dirname(root.rstrip("/")),
                                  "FlyingChairs_train_val.txt")):
            if os.path.isfile(cand):
                split_file = cand
                break
        if split_file is not None and split in ("train", "val"):
            labels = np.loadtxt(split_file, dtype=np.int64)
            want = 1 if split == "train" else 2
            self.records = [r for r, l in zip(records, labels) if l == want]
        else:
            self.records = self.split_records(records, split)

    def _load(self, rec: SampleRecord) -> Dict[str, np.ndarray]:
        return {
            "im1": read_image(rec.im1),
            "im2": read_image(rec.im2),
            "flow": load_flow(rec.flow),
        }


@register_dataset("flyingthings")
class FlyingThings(FlowDataset):
    """FlyingThings3D forward-flow pairs (clean pass).

    Supports both published layouts:
    - full: ``frames_cleanpass/TRAIN/<abc>/<seq>/left/NNNN.png`` +
      ``optical_flows/TRAIN/<abc>/<seq>/into_future/left/
      OpticalFlowIntoFuture_NNNN_L.pfm``
    - subset: ``<root>/train/image_clean/left/NNNNNNN.png`` +
      ``<root>/train/flow/left/into_future/NNNNNNN.pfm``
    """

    def __init__(self, root: str, split: str = "train",
                 render_pass: str = "cleanpass"):
        require_dir(root, "FlyingThings3D data")
        records = []
        subset_img = os.path.join(
            root, "train" if split != "val" else "val",
            "image_clean", "left")
        if os.path.isdir(subset_img):
            flow_dir = os.path.join(
                root, "train" if split != "val" else "val",
                "flow", "left", "into_future")
            for fp in sorted(glob.glob(os.path.join(flow_dir, "*.pfm"))):
                idx = int(os.path.splitext(os.path.basename(fp))[0])
                im1 = os.path.join(subset_img, f"{idx:07d}.png")
                im2 = os.path.join(subset_img, f"{idx + 1:07d}.png")
                if os.path.isfile(im1) and os.path.isfile(im2):
                    records.append(SampleRecord(im1=im1, im2=im2, flow=fp))
            self.records = records
            if not records:
                raise FileNotFoundError(f"no usable pairs under {root}")
            return

        part = "TRAIN" if split != "val" else "TEST"
        frame_root = os.path.join(root, f"frames_{render_pass}", part)
        flow_root = os.path.join(root, "optical_flows", part)
        if not os.path.isdir(flow_root):
            flow_root = os.path.join(root, "flow", part)  # alt layout
        for seq_dir in sorted(glob.glob(os.path.join(frame_root, "*", "*"))):
            rel = os.path.relpath(seq_dir, frame_root)
            imgs = sorted(glob.glob(os.path.join(seq_dir, "left", "*.png")))
            for im1, im2 in zip(imgs[:-1], imgs[1:]):
                n1 = int(os.path.splitext(os.path.basename(im1))[0])
                fp = os.path.join(
                    flow_root, rel, "into_future", "left",
                    f"OpticalFlowIntoFuture_{n1:04d}_L.pfm")
                if os.path.isfile(fp):
                    records.append(SampleRecord(im1=im1, im2=im2, flow=fp))
        if not records:
            raise FileNotFoundError(f"no usable pairs under {root}")
        self.records = records

    def _load(self, rec: SampleRecord) -> Dict[str, np.ndarray]:
        flow = load_flow(rec.flow)
        return {
            "im1": read_image(rec.im1),
            "im2": read_image(rec.im2),
            "flow": np.ascontiguousarray(flow[..., :2]),
        }


@register_dataset("sintel")
class Sintel(FlowDataset):
    """MPI Sintel: ``training/{clean,final}/<scene>/frame_NNNN.png``
    consecutive pairs with ``training/flow/<scene>/frame_NNNN.flo``."""

    def __init__(self, root: str, split: str = "train",
                 render_pass: str = "clean"):
        base = os.path.join(root, "training")
        if not os.path.isdir(base):
            base = root  # root may already point at training/
        img_root = os.path.join(base, render_pass)
        flow_root = os.path.join(base, "flow")
        require_dir(img_root, f"Sintel {render_pass}")
        require_dir(flow_root, "Sintel flow")
        records = []
        scenes = []
        for scene in sorted(os.listdir(img_root)):
            imgs = sorted(glob.glob(os.path.join(img_root, scene, "*.png")))
            for im1, im2 in zip(imgs[:-1], imgs[1:]):
                frame = os.path.splitext(os.path.basename(im1))[0]
                fp = os.path.join(flow_root, scene, frame + ".flo")
                if os.path.isfile(fp):
                    records.append(SampleRecord(im1=im1, im2=im2, flow=fp))
                    scenes.append(scene)
        if not records:
            raise FileNotFoundError(f"no usable pairs under {root}")
        # Scene-stable deterministic split: whole scenes go to one side
        # (record-level splitting leaks near-duplicate frames into val).
        self.records = self.split_groups(records, scenes, split)

    def _load(self, rec: SampleRecord) -> Dict[str, np.ndarray]:
        return {
            "im1": read_image(rec.im1),
            "im2": read_image(rec.im2),
            "flow": load_flow(rec.flow),
        }


@register_dataset("kitti")
class KITTI(FlowDataset):
    """KITTI 2012/2015 flow: ``image_2/NNNNNN_10.png`` + ``_11.png`` pairs
    with sparse 16-bit PNG GT in ``flow_occ`` (or ``flow_noc``)."""

    def __init__(self, root: str, split: str = "train",
                 occlusion: str = "occ"):
        base = os.path.join(root, "training")
        if not os.path.isdir(base):
            base = root
        img_root = os.path.join(base, "image_2")
        if not os.path.isdir(img_root):
            img_root = os.path.join(base, "colored_0")  # KITTI-2012 naming
        flow_root = os.path.join(base, f"flow_{occlusion}")
        require_dir(img_root, "KITTI image")
        require_dir(flow_root, "KITTI flow")
        records = []
        for fp in sorted(glob.glob(os.path.join(flow_root, "*_10.png"))):
            stem = os.path.basename(fp)[:-len("_10.png")]
            im1 = os.path.join(img_root, stem + "_10.png")
            im2 = os.path.join(img_root, stem + "_11.png")
            if os.path.isfile(im1) and os.path.isfile(im2):
                records.append(SampleRecord(im1=im1, im2=im2, flow=fp))
        if not records:
            raise FileNotFoundError(f"no usable pairs under {root}")
        self.records = self.split_records(records, split)

    def _load(self, rec: SampleRecord) -> Dict[str, np.ndarray]:
        flow, valid = read_kitti_png(rec.flow)
        return {
            "im1": read_image(rec.im1),
            "im2": read_image(rec.im2),
            "flow": flow,
            "valid": valid,
        }
