"""TPU-native 3D Gaussian Splatting framework (JAX / XLA / Pallas).

A from-scratch reimplementation of the capabilities of the INRIA 3DGS training
system (reference: mango1118/gaussian_splatting) designed TPU-first:

- differentiable tile-based EWA rasterization as fused Pallas kernels with a
  pure-JAX oracle implementation for cross-checking,
- functional, fixed-capacity Gaussian model state (densify/prune are jitted
  masked ops, not Python-object surgery),
- optax-based optimizers with per-parameter-group schedules,
- COLMAP / Blender dataset ingestion, PLY-compatible model export,
- multi-chip scaling via jax.sharding meshes (camera data-parallel and
  Gaussian/tile-sharded rendering).
"""

__version__ = "0.1.0"

from gaussian_splatting_tpu.config import (  # noqa: F401
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    RasterizeConfig,
)
