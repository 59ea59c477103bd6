#!/usr/bin/env python
"""fused-SSIM throughput: fused custom_vjp vs plain autodiff SSIM, fwd+bwd.

Reference anchor: submodules/fused-ssim/README.md:44 claims 5-8x over
pytorch-mssim on CUDA; this measures the TPU counterpart (value_and_grad of
mean SSIM at 1080p RGB).
"""

import time

import jax
import jax.numpy as jnp

from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from gaussian_splatting_tpu.ops.losses import fused_ssim, ssim

H, W = 1080, 1920
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
img = jax.random.uniform(k1, (3, H, W), jnp.float32)
ref = jax.random.uniform(k2, (3, H, W), jnp.float32)


def run(name, fn, n=20):
    f = jax.jit(jax.value_and_grad(lambda x: fn(x, ref)))
    v, g = jax.block_until_ready(f(img))
    t0 = time.perf_counter()
    for _ in range(n):
        v, g = f(img)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>12}: {dt*1e3:7.2f} ms  ({H*W/dt/1e6:.0f} Mpx/s fwd+bwd)",
          flush=True)
    return dt


t_plain = run("autodiff", lambda x, r: ssim(x, r).mean())
t_fused = run("fused", lambda x, r: fused_ssim(x, r))
print(f"speedup: {t_plain / t_fused:.2f}x")
