#!/usr/bin/env python
"""Microbenchmarks for the binning-plumbing redesign (round 2).

Measures, on the real backend, the primitives the instance pipeline is built
from so the redesign is driven by data:
  - multi-operand lax.sort cost vs payload count (can the sort carry meta?)
  - row gather / lane gather / scatter costs at pipeline sizes
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # scalar fetch forces real device completion on the axon tunnel
    # (block_until_ready can return early for remote arrays)
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.asarray(leaves[0]).ravel()[0])


_FLOOR = [0.0]


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0 - _FLOOR[0]) / n
    print(f"{name:>40}: {dt*1e3:9.2f} ms", flush=True)
    return out


def calibrate_floor():
    x = jnp.ones((8, 128))
    f = jax.jit(lambda a: a + 1)
    _sync(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(f(x))
        ts.append(time.perf_counter() - t0)
    _FLOOR[0] = min(ts)
    print(f"sync floor: {_FLOOR[0]*1e3:.1f} ms", flush=True)


def main():
    calibrate_floor()
    N = 2_752_512  # ~capacity incl sentinel slack
    P = 500_000
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    tile = jax.random.randint(k1, (N,), 0, 8160, dtype=jnp.int32)
    depth = jax.random.uniform(k2, (N,), jnp.float32, 0.1, 100.0)
    payload = [jax.random.uniform(jax.random.fold_in(k3, i), (N,)) for i in range(12)]
    g = jax.random.randint(k4, (N,), 0, P, dtype=jnp.int32)
    slots = jnp.arange(N, dtype=jnp.int32)

    for k in (0, 1, 2, 4, 8, 10, 12):
        ops = (tile, depth, g, slots) + tuple(payload[:k])
        f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=2, is_stable=True))
        timeit(f"sort 2-key + {k+2} payload ops", f, *ops)

    # one-key sort (inverse permutation use)
    f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    timeit("sort 1-key + 1 payload", f, g, slots)

    table16 = jax.random.uniform(k3, (P, 16))
    ids = jax.random.randint(k4, (N,), 0, P, dtype=jnp.int32)
    f = jax.jit(lambda t, i: t[i])
    timeit("row gather (P,16)[N ids]", f, table16, ids)
    table8 = table16[:, :8]
    timeit("row gather (P,8)[N ids]", f, table8, ids)

    wide = jax.random.uniform(k3, (16, N))
    perm = jax.random.permutation(k1, N).astype(jnp.int32)
    f = jax.jit(lambda t, i: t[:, i])
    timeit("lane gather (16,N)[:, perm]", f, wide, perm)
    wide10 = wide[:10]
    timeit("lane gather (10,N)[:, perm]", f, wide10, perm)

    # transposed variant: gather rows of (N,16) by perm
    tall = jnp.asarray(wide.T)
    f2 = jax.jit(lambda t, i: t[i])
    timeit("row gather (N,16)[perm]", f2, tall, perm)

    offs = jnp.sort(jax.random.randint(k2, (P,), 0, N, dtype=jnp.int32))
    f = jax.jit(lambda o: jnp.zeros((N,), jnp.int32).at[o].add(1, mode="drop"))
    timeit("scatter-add ones at (P,) sorted offs", f, offs)

    f = jax.jit(lambda i, v: jnp.full((N,), -1, jnp.int32).at[i].set(v, mode="drop"))
    timeit("scatter-set 1 col (N ids)", f, ids, g)

    # searchsorted with ~17k queries (chunk bases)
    q = jnp.arange(0, N, 128, dtype=jnp.int32)
    f = jax.jit(lambda a, b: jnp.searchsorted(a, b, side="right"))
    timeit("searchsorted 21k queries into (P,)", f, offs, q)

    # how much does sorting N=2.25M (no sentinels) vs 2.75M matter
    M = 2_252_800
    ops = (tile[:M], depth[:M], g[:M], slots[:M])
    f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=2, is_stable=True))
    timeit("sort 2-key 4ops at N=2.25M", f, *ops)

    # stack/transpose cost for building the (P,16) field table
    cols = [jax.random.uniform(jax.random.fold_in(k1, i), (P,)) for i in range(16)]
    f = jax.jit(lambda *c: jnp.stack(c, axis=1))
    timeit("stack 16 (P,) cols -> (P,16)", f, *cols)


if __name__ == "__main__":
    main()
