"""Configuration dataclasses.

Replaces the reference's reflection-based argparse groups
(``arguments/__init__.py:19-100``) with plain dataclasses.  Defaults mirror the
reference's ``ModelParams`` / ``OptimizationParams`` / ``PipelineParams``
(``arguments/__init__.py:47-100``) so a training run reproduces the published
schedule exactly.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ModelConfig:
    """Scene/model options (reference ``ModelParams``, arguments/__init__.py:47-64)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    depths: str = ""
    resolution: int = -1
    white_background: bool = False
    train_test_exp: bool = False
    data_device: str = "cpu"  # host-side image staging; device transfer is per-step
    eval: bool = False


@dataclass
class PipelineConfig:
    """Render-pipeline switches (reference ``PipelineParams``, arguments/__init__.py:66-72)."""

    convert_SHs_python: bool = False  # kept for CLI compat; JAX path is single-source
    compute_cov3D_python: bool = False
    debug: bool = False
    antialiasing: bool = False
    # Which rasterizer implementation to use: "auto" | "pallas" | "jax" | "dense".
    rasterizer_impl: str = "auto"


@dataclass
class OptimizationConfig:
    """Training schedule (reference ``OptimizationParams``, arguments/__init__.py:74-100)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.025
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    exposure_lr_init: float = 0.01
    exposure_lr_final: float = 0.001
    exposure_lr_delay_steps: int = 0
    exposure_lr_delay_mult: float = 0.0
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    depth_l1_weight_init: float = 1.0
    depth_l1_weight_final: float = 0.01
    random_background: bool = False
    optimizer_type: str = "default"  # "default" | "sparse_adam"


@dataclass
class RasterizeConfig:
    """Static rasterizer parameters (compile-time constants under jit).

    Tile geometry mirrors the reference's 16x16 blocks
    (``submodules/diff-gaussian-rasterization/cuda_rasterizer/config.h:15-17``);
    the Pallas kernels chunk instances 128 at a time along the lane axis.
    """

    tile_w: int = 16
    tile_h: int = 16
    # FORWARD-blend instances per inner step (lane dimension).  Per-chunk
    # fixed costs (DMA issue, per-pixel-block state read-modify-write, the
    # cross-lane reductions) dominate the forward, so bigger is better until
    # masked-lane waste wins: 128/256/512/1024 measured 33.0/26.3/22.0/42.3 ms
    # standalone at bench shape (tools/sweep_blend.py, round 5).  The
    # backward stays at min(chunk, 128) — its per-lane gradient math
    # dominates and bigger chunks measured flat-to-worse.  The
    # expansion/sort pipeline keeps its 128-lane granularity
    # (ops/expand.CHUNK); instances.build_instances pads the internal
    # capacity by 8*CHUNK so the last window DMA of a 512-lane chunk stays
    # in bounds.
    chunk: int = 512
    # Instance-buffer capacity as a multiple of the Gaussian count; the
    # fixed-capacity buffer replaces the reference's device-to-host
    # ``num_rendered`` sync (rasterizer_impl.cu:309-313).  If the buffer
    # overflows, the step reports it and the caller re-runs with more slack.
    instance_slack: float = 2.0
    antialiasing: bool = False
    impl: str = "auto"  # "auto" | "pallas" | "jax" | "dense"
    # Debug fallbacks (reference arguments/__init__.py:68-69 +
    # gaussian_renderer/__init__.py:86-111): compute SH->RGB / the 3D
    # covariance OUTSIDE preprocess and feed them through the
    # colors_precomp/cov3d_precomp hooks — the oracle cross-check that the
    # precomp path matches the fused path.
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False


def save_config(cfg, path: str) -> None:
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_config(cls, path: str):
    with open(path) as f:
        data = json.load(f)
    known = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in data.items() if k in known})
