#!/usr/bin/env python
"""Dump the gshard train step's compiled HLO (virtual CPU mesh) and print
the ordered skeleton of collectives vs blend custom-calls — the evidence
base for the ICI-overlap design note in DEVNOTES (BASELINE.md north star:
exchange traffic overlapped with backward blend)."""
import os, re, sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as PS

from gaussian_splatting_tpu.config import OptimizationConfig, RasterizeConfig
from gaussian_splatting_tpu.models.gaussians import create_from_pcd
from gaussian_splatting_tpu.parallel.gshard import gshard_train_step
from gaussian_splatting_tpu.parallel.mesh import make_mesh
from gaussian_splatting_tpu.train.step import StepBatch, init_train_state
from gaussian_splatting_tpu.utils.testing import random_scene

n = 8
mesh = make_mesh(n)
rng = np.random.default_rng(0)
P = 1024
pts = rng.uniform(-0.8, 0.8, (P, 3)).astype(np.float32)
cols = rng.uniform(0, 1, (P, 3)).astype(np.float32)
model = create_from_pcd(pts, cols, max_sh_degree=2, spatial_lr_scale=1.0, capacity=2048)
state = init_train_state(model, num_images=1)
cap = state.model.capacity

def put(x):
    spec = PS("data") if getattr(x, "ndim", 0) >= 1 and x.shape[0] == cap else PS()
    return jax.device_put(x, NamedSharding(mesh, spec))

state = jax.tree_util.tree_map(put, state)
w = h = 64
sc = random_scene(4, width=w, height=h, seed=1)
batch = StepBatch(
    gt_image=jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32)),
    alpha_mask=jnp.ones((1, h, w)), invdepth_gt=jnp.zeros((h, w)),
    depth_mask=jnp.zeros((h, w)), exposure_idx=jnp.asarray(0, jnp.int32),
    bg_color=jnp.zeros(3),
)
step = jax.jit(lambda s, b: gshard_train_step(
    s, sc.cam, b, mesh, opt=OptimizationConfig(), raster=RasterizeConfig()))
txt = step.lower(state, batch).compile().as_text()
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gshard_hlo.txt"
with open(out, "w") as f:
    f.write(txt)
print(f"HLO -> {out} ({len(txt)} bytes)")

# ordered skeleton: collectives + pallas custom-calls in the main computation
main = txt.split("ENTRY")[-1]
pat = re.compile(r"(\w[\w.-]*) = .*?(all-to-all|all-reduce|all-gather|"
                 r"collective-permute|reduce-scatter|custom-call|sort)\(")
seen = []
for line in main.splitlines():
    m = pat.search(line)
    if not m:
        continue
    kind = m.group(2)
    label = ""
    lm = re.search(r'called_computations=\{([^}]*)\}|custom_call_target="([^"]*)"', line)
    if lm:
        label = lm.group(1) or lm.group(2) or ""
    seen.append((m.group(1), kind, label[:60]))
print(f"\nordered collectives/custom-calls in ENTRY ({len(seen)}):")
for name, kind, label in seen:
    print(f"  {kind:20} {name:28} {label}")
