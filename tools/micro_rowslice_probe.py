#!/usr/bin/env python
"""Probe: which second-minor dims can Mosaic DMA from HBM windows?

For k in {1,2,4,8,9,10,12,15,16}: build a (k, N) f32 HBM array and a kernel
that copies (k, 256) windows at dynamic 128-aligned offsets into VMEM and
writes them out.  Records compile-or-reject per k — determines the legal
field-count design space for the instance meta streams.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = 4096
WIN = 256


def kernel(src_hbm, out_ref, win, sem, *, k):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(i * 128, WIN)], win, sem
    )
    cp.start()
    cp.wait()
    out_ref[...] = win[:, :128] + win[:, 128:]


def probe(k):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // 128 - 1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((k, 128), lambda i: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((k, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    x = jnp.arange(k * N, dtype=jnp.float32).reshape(k, N)
    out = pl.pallas_call(
        functools.partial(kernel, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, (N // 128 - 1) * 128), jnp.float32),
    )(x)
    ref = x[:, : -128] + x[:, 128:]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


if __name__ == "__main__":
    for k in (1, 2, 4, 8, 9, 10, 12, 15, 16):
        try:
            probe(k)
            print(f"k={k:2d}: OK")
        except Exception as e:
            msg = str(e).split("\n")[0][:110]
            print(f"k={k:2d}: REJECTED {msg}")
        sys.stdout.flush()
