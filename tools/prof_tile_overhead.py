#!/usr/bin/env python
"""Isolate the fixed per-tile cost of the blend kernel."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_TILES = 8160
T_PER = 4
PIX = 256
OUT_COLS = 8
GRID_X = 120
CHUNK = 128


def timeit(name, fn, *args, n=10):
    _ = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        _ = float(fn(*args))
    print(f"{name:>40}: {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)


def make(variant):
    def kernel(starts_ref, ends_ref, meta_hbm, out_ref, meta_vmem, sems):
        for t in range(T_PER):
            tile_id = pl.program_id(0) * T_PER + t

            @pl.when(tile_id < NUM_TILES)
            def _():
                if variant >= 1:
                    lane8 = jax.lax.broadcasted_iota(jnp.int32, (PIX, OUT_COLS), 1)
                    out_ref[t] = jnp.where(lane8 == 3, 1.0, 0.0)
                if variant >= 2:
                    start = pl.multiple_of(starts_ref[tile_id], CHUNK)
                    end = ends_ref[tile_id]
                    nchunks = pl.cdiv(end - start, CHUNK)
                    ty = tile_id // GRID_X
                    tx = tile_id % GRID_X
                    idx = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
                    px = (tx * 16 + idx % 16).astype(jnp.float32)
                    py = (ty * 16 + idx // 16).astype(jnp.float32)
                    out_ref[t] = out_ref[t] + px + py
                if variant >= 3:
                    def body(state):
                        c, alldone = state
                        return c + 1, alldone

                    def cond(state):
                        c, alldone = state
                        return (c < nchunks) & jnp.logical_not(alldone)

                    c_final, _ = jax.lax.while_loop(
                        cond, body, (jnp.int32(0), jnp.bool_(False))
                    )
                    out_ref[t] = out_ref[t] + c_final.astype(jnp.float32)
                if variant >= 4:
                    def dma(slot, c):
                        return pltpu.make_async_copy(
                            meta_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
                            meta_vmem.at[slot],
                            sems.at[slot],
                        )

                    @pl.when(nchunks > 0)
                    def _():
                        dma(0, 0).start()
                        dma(0, 0).wait()

    nprog = NUM_TILES // T_PER
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((T_PER, PIX, OUT_COLS), lambda i, s_, e_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_TILES, PIX, OUT_COLS), jnp.float32),
    )
    return jax.jit(lambda s, e, m: f(s, e, m).sum())


meta = jnp.zeros((16, NUM_TILES * CHUNK + CHUNK), jnp.float32)
starts = jnp.arange(NUM_TILES, dtype=jnp.int32) * CHUNK
ends0 = starts  # empty tiles
ends1 = starts + CHUNK  # one chunk per tile

for v in range(5):
    timeit(f"variant {v} empty", make(v), starts, ends0, meta)
timeit("variant 4 one-chunk-dma", make(4), starts, ends1, meta)
