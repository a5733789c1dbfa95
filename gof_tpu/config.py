"""Configuration system.

Replaces arguments/__init__.py: dataclass fields auto-become argparse flags
(same reflection UX as the reference's ParamGroup), and the training config is
persisted as JSON `cfg_args.json` in the model directory so inference CLIs
inherit it (the reference eval()s a Python-repr'd Namespace,
arguments/__init__.py:105-125 — we serialize JSON instead).

Defaults mirror arguments/__init__.py:47-103.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass


@dataclass
class ModelParams:
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"
    eval: bool = False
    sh_degree: int = 3
    # Mip-Splatting 2D dilation added to the screen-space covariance diagonal
    kernel_size: float = 0.0
    # Deviation note: the reference declares ray_jitter / resample_gt_image
    # flags (arguments/__init__.py:59-60) but never wires them — the
    # subpixel_offset stays zeros and create_offset_gt (train.py:41) is dead
    # code upstream. We drop the flags rather than carry dead config.
    load_allres: bool = False
    # 30% of camera picks come from the >= 800px-wide subset
    # (train.py:112-116,139-141)
    sample_more_highres: bool = False
    use_decoupled_appearance: bool = False


@dataclass
class PipelineParams:
    # backend selection replaces the reference's python-fallback switches
    backend: str = "pallas"  # 'pallas' | 'xla'
    # failure forensics (the reference's debug snapshot dumps + CHECK_CUDA,
    # dgr/__init__.py:89-96 / auxiliary.h:204-211): every metrics readback
    # checks the loss for non-finite values and, on failure, dumps the full
    # render inputs (gaussian params, optimizer/densification state, camera,
    # capacity telemetry) to <model>/debug/snapshot_iterNNNNNN.npz before
    # aborting, so the failing step is exactly reproducible offline.
    debug: bool = False
    # static duplicated-key capacity; host grows + re-jits on overflow
    key_capacity: int = 1 << 21
    # static compact gradient-buffer capacity for the pallas backward
    # (live, pre-saturation slot rows only); 0 = safe worst case. The host
    # tightens it from observed demand on re-jits and grows it on overflow.
    compact_capacity: int = 0
    # static Gaussian capacity headroom factor when growing
    capacity_headroom: float = 1.3
    # static capacity of the liveness-compacted key list (temporal liveness
    # culling, binning.compact_live): 0 = culling disabled. The training
    # loop enables it once densification ends and right-sizes it from the
    # live-demand telemetry; keys past each tile's cached saturation prefix
    # are image-exactly dead (the forward loop would never read them).
    live_capacity: int = 0


@dataclass
class OptimizationParams:
    iterations: int = 30_000
    position_lr_init: float = 0.000_16
    position_lr_final: float = 0.000_001_6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    appearance_embeddings_lr: float = 0.001
    appearance_network_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    lambda_distortion: float = 100.0
    lambda_depth_normal: float = 0.05
    distortion_from_iter: int = 15_000
    depth_normal_from_iter: int = 15_000
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002


def add_group(parser: argparse.ArgumentParser, cls, prefix: str = "") -> None:
    """Register a dataclass's fields as CLI flags (ParamGroup-style)."""
    for f in dataclasses.fields(cls):
        name = f"--{f.name}"
        if f.type in ("bool", bool):
            parser.add_argument(name, action="store_true", default=f.default)
        else:
            typ = {"int": int, "float": float, "str": str}.get(str(f.type), type(f.default))
            parser.add_argument(name, type=typ, default=f.default)
    # short aliases matching the reference's most-used flags
    for short, long in (("-s", "--source_path"), ("-m", "--model_path"), ("-r", "--resolution")):
        for a in parser._actions:
            if a.option_strings == [long]:
                a.option_strings.insert(0, short)
                parser._option_string_actions[short] = a


def extract(cls, ns: argparse.Namespace):
    return cls(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(cls)})


def save_cfg(model_path: str, model: ModelParams, pipe: PipelineParams, opt: OptimizationParams) -> None:
    os.makedirs(model_path, exist_ok=True)
    cfg = {
        "model": dataclasses.asdict(model),
        "pipeline": dataclasses.asdict(pipe),
        "optimization": dataclasses.asdict(opt),
    }
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(cfg, f, indent=2)


def load_cfg(model_path: str):
    """Load persisted training config; returns (ModelParams, PipelineParams,
    OptimizationParams). Inference CLIs merge CLI overrides on top, matching
    get_combined_args (arguments/__init__.py:105-125)."""
    with open(os.path.join(model_path, "cfg_args.json")) as f:
        cfg = json.load(f)
    return (
        ModelParams(**cfg["model"]),
        PipelineParams(**cfg["pipeline"]),
        OptimizationParams(**cfg["optimization"]),
    )


def combined_args(parser: argparse.ArgumentParser, argv=None):
    """Parse CLI; if --model_path has a cfg_args.json, use it for defaults the
    user did not override on the command line."""
    ns = parser.parse_args(argv)
    mp = getattr(ns, "model_path", "")
    cfg_file = os.path.join(mp, "cfg_args.json") if mp else ""
    if cfg_file and os.path.exists(cfg_file):
        with open(cfg_file) as f:
            cfg = json.load(f)
        merged = {}
        for group in cfg.values():
            merged.update(group)
        # CLI flags explicitly provided win; detect via sentinel re-parse
        defaults = parser.parse_args([])
        for k, v in merged.items():
            if hasattr(ns, k) and getattr(ns, k) == getattr(defaults, k, None):
                setattr(ns, k, v)
    return ns
