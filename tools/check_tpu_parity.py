#!/usr/bin/env python
"""Quick TPU parity check: pallas pipeline vs dense oracle, fwd + grads."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from gaussian_splatting_tpu.config import RasterizeConfig
from gaussian_splatting_tpu.ops.rasterize import render
from gaussian_splatting_tpu.utils.testing import random_scene

scene = random_scene(3000, sh_degree=2, width=128, height=96, seed=3)
cfg = RasterizeConfig(instance_slack=16.0)


def loss(impl, m, s, q, o, sh):
    out = render(m, s, q, o, sh, scene.cam, scene.bg, sh_degree=2, cfg=cfg, impl=impl)
    return (
        jnp.sum(out.image * jnp.cos(jnp.arange(out.image.size).reshape(out.image.shape)))
        + 0.3 * jnp.sum(out.invdepth)
    ), out


args = (scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)

for impl in ("dense", "pallas"):
    (l, out), grads = jax.jit(
        jax.value_and_grad(lambda *a: loss(impl, *a), argnums=(0, 1, 2, 3, 4), has_aux=True)
    )(*args)
    print(f"{impl}: loss={float(l):.6f} overflow={bool(out.overflow)} "
          f"inst={int(out.num_instances)}")
    if impl == "dense":
        ref_img, ref_l, ref_g = out.image, l, grads
    else:
        img_err = float(jnp.abs(out.image - ref_img).max())
        print(f"image max abs err: {img_err:.3e}")
        for name, a, b in zip(("means", "scales", "quats", "opac", "sh"), grads, ref_g):
            denom = float(jnp.abs(b).max()) + 1e-12
            err = float(jnp.abs(a - b).max())
            print(f"grad {name:>6}: max abs err {err:.3e}  (rel {err/denom:.3e})")
        assert img_err < 1e-4, "image mismatch"
