#!/usr/bin/env python
"""Part 2: gathers/scatters/searchsorted at pipeline sizes + the planned
13-operand payload sort (run last; compile is minutes)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from micro_sortgather import calibrate_floor, timeit


def main():
    calibrate_floor()
    N = 2_752_512
    P = 500_000
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    table16 = jax.random.uniform(k3, (P, 16))
    ids = jax.random.randint(k4, (N,), 0, P, dtype=jnp.int32)
    f = jax.jit(lambda t, i: t[i])
    timeit("row gather (P,16)[N ids]", f, table16, ids)

    wide = jax.random.uniform(k3, (16, N))
    perm = jax.random.permutation(k1, N).astype(jnp.int32)
    f = jax.jit(lambda t, i: t[:, i])
    timeit("lane gather (16,N)[:, perm]", f, wide, perm)
    wide11 = wide[:11]
    timeit("lane gather (11,N)[:, perm]", f, wide11, perm)

    g = jax.random.randint(k4, (N,), 0, P, dtype=jnp.int32)
    offs = jnp.sort(jax.random.randint(k2, (P,), 0, N, dtype=jnp.int32))
    f = jax.jit(lambda o: jnp.zeros((N,), jnp.int32).at[o].add(1, mode="drop"))
    timeit("scatter-add ones at (P,) sorted offs", f, offs)

    f = jax.jit(lambda i, v: jnp.full((N,), -1, jnp.int32).at[i].set(v, mode="drop"))
    timeit("scatter-set 1 col (N ids)", f, ids, g)

    q = jnp.arange(0, N, 128, dtype=jnp.int32)
    f = jax.jit(lambda a, b: jnp.searchsorted(a, b, side="right"))
    timeit("searchsorted 21k queries into (P,)", f, offs, q)

    qt = jax.random.randint(k1, (8160,), 0, N, dtype=jnp.int32)
    srt = jnp.sort(ids)
    f = jax.jit(lambda a, b: jnp.searchsorted(a, b, side="left"))
    timeit("searchsorted 8k queries into (N,)", f, srt, qt)

    cols = [jax.random.uniform(jax.random.fold_in(k1, i), (P,)) for i in range(16)]
    f = jax.jit(lambda *c: jnp.stack(c, axis=1))
    timeit("stack 16 (P,) cols -> (P,16)", f, *cols)

    colsN = [jax.random.uniform(jax.random.fold_in(k2, i), (N,)) for i in range(11)]
    f = jax.jit(lambda *c: jnp.stack(c, axis=0))
    timeit("stack 11 (N,) rows -> (11,N)", f, *colsN)

    # inverse permutation via 1-key sort
    slots = jnp.arange(N, dtype=jnp.int32)
    f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    timeit("sort 1-key + 1 payload (N)", f, perm, slots)

    # THE planned production sort: keys (tile, depth) + 10 payload + src
    tile = jax.random.randint(k1, (N,), 0, 8160, dtype=jnp.int32)
    depth = jax.random.uniform(k2, (N,), jnp.float32, 0.1, 100.0)
    payload = [jax.random.uniform(jax.random.fold_in(k3, i), (N,)) for i in range(10)]
    ops = (tile, depth) + tuple(payload) + (slots,)
    f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=2, is_stable=True))
    print("compiling 13-op sort...", flush=True)
    timeit("sort 2-key 13 ops total", f, *ops)
    M = 2_252_800
    ops = tuple(o[:M] for o in ops)
    timeit("sort 2-key 13 ops at N=2.25M", f, *ops)


if __name__ == "__main__":
    main()
