#!/usr/bin/env python
"""Can Pallas DMA (16, chunk) slices from HBM at UNALIGNED dynamic lane
offsets, and write them back unaligned?  Decides whether the compact
(non-chunk-aligned) instance layout is feasible (round-2 binning redesign).

Also times aligned vs unaligned variants at production chunk counts.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16
CHUNK = 128


def _kernel(starts_ref, src_hbm, out_hbm, vmem, sems, *, nsteps, aligned):
    i = pl.program_id(0)

    @pl.when(i < nsteps)
    def _():
        start = starts_ref[i]
        if aligned:
            start = pl.multiple_of(start, CHUNK)
        in_cp = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(start, CHUNK)], vmem.at[0], sems.at[0]
        )
        in_cp.start()
        in_cp.wait()
        vmem[1] = vmem[0] * 2.0
        out_cp = pltpu.make_async_copy(
            vmem.at[1], out_hbm.at[:, pl.ds(start, CHUNK)], sems.at[1]
        )
        out_cp.start()
        out_cp.wait()


def run(n, nsteps, aligned, seed=0):
    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.uniform(size=(ROWS, n)).astype(np.float32))
    if aligned:
        starts = (rng.integers(0, (n - CHUNK) // CHUNK, nsteps) * CHUNK).astype(
            np.int32
        )
    else:
        starts = rng.integers(0, n - CHUNK, nsteps).astype(np.int32)
    starts_j = jnp.asarray(starts)

    kernel = functools.partial(_kernel, nsteps=nsteps, aligned=aligned)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = jax.jit(
        lambda s, x: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ROWS, n), jnp.float32),
        )(s, x)
    )
    out = f(starts_j, src)
    if n <= 100_000:  # verify only at small size (tunnel transfer is slow)
        got = np.asarray(out)
        expect = np.zeros_like(got)
        for s in starts:
            expect[:, s : s + CHUNK] = np.asarray(src)[:, s : s + CHUNK] * 2.0
        mask = expect != 0
        ok = np.allclose(got[mask], expect[mask])
        print(f"aligned={aligned} n={n}: correct={ok}", flush=True)
        return

    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(starts_j, src)
    _ = float(jnp.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0 - 0.03) / 10
    print(
        f"aligned={aligned}: {dt*1e3:.2f} ms for {nsteps} chunk round-trips "
        f"({dt/nsteps*1e9:.0f} ns/chunk)",
        flush=True,
    )


if __name__ == "__main__":
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    run(65_536, 200, aligned=True)
    run(65_536, 200, aligned=False)
    N = 2_252_800
    run(N, 17600, aligned=True)
    run(N, 17600, aligned=False)
