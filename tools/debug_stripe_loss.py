"""Fast repro for the stripe-local gshard loss parity failure.

One single-device step vs one sharded step on the tiny test scene; prints
loss / l1 / grads side by side with a full traceback.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_TRACEBACK_FILTERING"] = "off"

from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from functools import partial

import sys

sys.path.insert(0, "/root/repo/tests")
from test_parallel import _dp_setup  # noqa: E402

from gaussian_splatting_tpu.config import OptimizationConfig, RasterizeConfig
from gaussian_splatting_tpu.parallel.gshard import gshard_train_step
from gaussian_splatting_tpu.parallel.mesh import make_mesh
from gaussian_splatting_tpu.train.step import train_step

n_dev = 4
mesh = make_mesh(n_dev)
state_a, _, _, cams, batches = _dp_setup(1, w=48, h=32)
state_b = state_a
opt = OptimizationConfig()
raster = RasterizeConfig()
single = partial(train_step, opt=opt, raster=raster)
sharded = partial(gshard_train_step, mesh=mesh, opt=opt, raster=raster)

for it in range(3):
    state_a, ma = single(state_a, cams[0], batches[0])
    state_b, mb = sharded(state_b, cams[0], batches[0])
    la, lb = float(ma["loss"]), float(mb["loss"])
    l1a, l1b = float(ma["l1"]), float(mb["l1"])
    print(f"it {it}: loss single={la:.8f} sharded={lb:.8f} diff={la-lb:+.2e}")
    print(f"        l1   single={l1a:.8f} sharded={l1b:.8f} diff={l1a-l1b:+.2e}")
    da = np.asarray(state_a.model.params.means3d)
    db = np.asarray(state_b.model.params.means3d)
    print(f"        means3d max|diff| = {np.abs(da - db).max():.3e}")
    ea = np.asarray(state_a.exposures)
    eb = np.asarray(state_b.exposures)
    print(f"        exposure max|diff| = {np.abs(ea - eb).max():.3e}")
    xa = np.asarray(state_a.model.aux.xyz_grad_accum)
    xb = np.asarray(state_b.model.aux.xyz_grad_accum)
    print(f"        tapacc max|diff| = {np.abs(xa - xb).max():.3e}")
print("done")
