#!/usr/bin/env python
"""Two-process multi-host dry run (SURVEY §5 comm-backend checklist).

Spawns itself as 2 JAX processes (the simulated 2-host DCN topology), each
owning 4 virtual CPU devices, then:
  1. ``jax.distributed.initialize`` wires the process group
     (parallel/mesh.py::init_distributed — the NCCL/MPI role);
  2. builds the GLOBAL 8-device mesh spanning both processes;
  3. runs a psum over the global axis (the cross-host collective);
  4. runs one camera-DP training step sharded across both processes —
     gradient psums ride the inter-process link (DCN on a real pod);
  5. only process 0 writes the result file (the multi-host file-output
     discipline used by the training loop).

Usage: python tools/multihost_dryrun.py            # parent: spawns workers
       python tools/multihost_dryrun.py --worker i # internal
"""

import json
import os
import subprocess
import sys
import time

PORT = 12945
OUT = "/tmp/multihost_dryrun.json"


def worker(pid: int, nproc: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gaussian_splatting_tpu.parallel.mesh import init_distributed, is_main_process

    init_distributed(f"127.0.0.1:{PORT}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))

    # --- cross-process collective ---
    from jax import shard_map

    def body(x):
        return jax.lax.psum(x, "data")

    x = jnp.ones((8, 4))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(
        shard_map(body, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    )(xs)
    local_vals = [np.asarray(s.data) for s in out.addressable_shards]
    assert all((v == 8.0).all() for v in local_vals), local_vals

    # --- one DP training step across both processes ---
    from gaussian_splatting_tpu.config import OptimizationConfig, RasterizeConfig
    from gaussian_splatting_tpu.models.gaussians import create_from_pcd
    from gaussian_splatting_tpu.ops.camera_math import CameraParams
    from gaussian_splatting_tpu.parallel.dp import dp_train_step
    from gaussian_splatting_tpu.train.step import StepBatch, init_train_state
    from gaussian_splatting_tpu.utils.testing import random_scene

    rng = np.random.default_rng(0)
    w = h = 32
    n_dev = 8
    pts = rng.uniform(-0.8, 0.8, (64, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    model = create_from_pcd(
        pts, cols, max_sh_degree=1, spatial_lr_scale=1.0, capacity=128
    )
    state = init_train_state(model, num_images=n_dev)
    cams, batches = [], []
    for i in range(n_dev):
        sc = random_scene(4, width=w, height=h, seed=30 + i)
        cams.append(sc.cam)
        batches.append(
            StepBatch(
                gt_image=jnp.asarray(
                    rng.uniform(0, 1, (3, h, w)).astype(np.float32)
                ),
                alpha_mask=jnp.ones((1, h, w)),
                invdepth_gt=jnp.zeros((h, w)),
                depth_mask=jnp.zeros((h, w)),
                exposure_idx=jnp.asarray(i, jnp.int32),
                bg_color=jnp.zeros(3),
            )
        )
    stacked_cams = CameraParams(
        viewmatrix=jnp.stack([c.viewmatrix for c in cams]),
        projmatrix=jnp.stack([c.projmatrix for c in cams]),
        campos=jnp.stack([c.campos for c in cams]),
        tan_fovx=cams[0].tan_fovx,
        tan_fovy=cams[0].tan_fovy,
        width=w,
        height=h,
    )
    stacked_batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    # global batch sharded over the cross-process mesh
    sharded = NamedSharding(mesh, P("data"))
    stacked_cams = dataclasses_put(stacked_cams, sharded, jax)
    stacked_batch = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharded), stacked_batch
    )
    new_state, metrics = jax.jit(
        lambda s, c, b: dp_train_step(
            s, c, b, mesh, opt=OptimizationConfig(), raster=RasterizeConfig()
        )
    )(state, stacked_cams, stacked_batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    # --- process-0-only file output ---
    if is_main_process():
        with open(OUT, "w") as f:
            json.dump({"ok": True, "processes": nproc, "loss": loss}, f)
    print(f"[proc {pid}] multihost dryrun OK, loss={loss:.4f}", flush=True)


def dataclasses_put(tree, sharding, jax):
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding) if hasattr(a, "shape") and a.ndim > 0 else a,
        tree,
    )


def main():
    if "--worker" in sys.argv:
        i = int(sys.argv[sys.argv.index("--worker") + 1])
        worker(i, 2)
        return
    if os.path.exists(OUT):
        os.remove(OUT)
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
            env=env,
        )
        for i in range(2)
    ]
    rc = [p.wait(timeout=1200) for p in procs]
    assert rc == [0, 0], rc
    with open(OUT) as f:
        print("result:", f.read())


if __name__ == "__main__":
    main()
