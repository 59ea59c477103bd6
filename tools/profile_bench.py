#!/usr/bin/env python
"""Device-trace profile of the bench step; prints top XLA ops by self time."""

import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from gaussian_splatting_tpu.config import RasterizeConfig
from gaussian_splatting_tpu.ops.rasterize import render
from gaussian_splatting_tpu.utils.testing import random_scene

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gs_trace"

scene = random_scene(500_000, sh_degree=3, width=1920, height=1080, seed=0,
                     spread=2.0, scale_range=(0.0025, 0.012), cam_distance=4.0)
cfg = RasterizeConfig()

# honest capacity, same as bench.py: measured demand + 5%
from gaussian_splatting_tpu.ops.preprocess import preprocess

_tt = jax.jit(lambda m, s, q, o, sh_: preprocess(
    m, s, q, o, sh_, scene.cam, sh_degree=3).tiles_touched)(
    scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)
_demand = int(jnp.sum(jnp.maximum(_tt, 1)))
CAPACITY = -(-int(_demand * 1.05) // 128) * 128
print(f"slot demand {_demand}, capacity {CAPACITY}", file=sys.stderr)


def loss_fn(means3d, scales, quats, opacities, sh):
    out = render(means3d, scales, quats, opacities, sh, scene.cam, scene.bg,
                 sh_degree=3, cfg=cfg, impl="pallas", capacity=CAPACITY)
    return jnp.sum(out.image) + jnp.sum(out.invdepth)


args = (scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)
step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
# dump the optimized HLO so trace op names (copy.N/fusion.N) can be resolved
with open("/tmp/bench_hlo.txt", "w") as f:
    f.write(step.lower(*args).compile().as_text())
g = step(*args)
print("warm:", float(jax.tree_util.tree_leaves(g)[0].ravel()[0]))

jax.profiler.start_trace(OUT)
for _ in range(3):
    g = step(*args)
print("traced:", float(jax.tree_util.tree_leaves(g)[0].ravel()[0]))
jax.profiler.stop_trace()

# ---- parse the trace ----
paths = glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"), recursive=True)
latest = max(paths, key=os.path.getmtime)
with gzip.open(latest, "rt") as f:
    trace = json.load(f)

events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
# device-side lanes only: XLA op events carry 'dur' in us
from collections import defaultdict

agg = defaultdict(float)
for e in events:
    name = e.get("name", "")
    args_ = e.get("args") or {}
    if "run_id" in args_ or "group_id" in args_:
        continue
    pid = e.get("pid")
    agg[(pid, name)] += e.get("dur", 0)

# find the device pid by largest total
pid_tot = defaultdict(float)
for (pid, name), d in agg.items():
    pid_tot[pid] += d
# print process names
pnames = {e.get("pid"): (e.get("args") or {}).get("name", "") for e in trace["traceEvents"] if e.get("ph") == "M" and e.get("name") == "process_name"}
for pid, tot in sorted(pid_tot.items(), key=lambda kv: -kv[1])[:5]:
    print(f"pid {pid} ({pnames.get(pid,'?')}): total {tot/1e3/3:.2f} ms/iter")

tpu_pids = [p for p, n in pnames.items() if "TPU" in str(n)]
best_pid = tpu_pids[0] if tpu_pids else max(pid_tot, key=pid_tot.get)
rows = [(name, d) for (pid, name), d in agg.items() if pid == best_pid]
rows.sort(key=lambda kv: -kv[1])
print(f"\nTop ops on pid {best_pid} ({pnames.get(best_pid,'?')}), ms/iter over 3 iters:")
for name, d in rows[:40]:
    print(f"  {d/1e3/3:9.2f} ms  {name[:110]}")
