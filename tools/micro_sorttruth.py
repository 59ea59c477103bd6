#!/usr/bin/env python
"""Sanity-check standalone sort timing on this backend.

Round-5 anomaly: micro_sortpack reported 0.03-0.15 ms for bench-shape sorts
that cost ~15 ms each inside the bench trace.  This probe (a) forces a
data dependency (checksum of every output) and blocks per iteration,
(b) calibrates the harness with a matmul of known cost, and (c) traces one
sort to read device self-time directly.
"""

import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 2_089_472


def timed_blocked(fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, 8160, N), jnp.int32)
    depth = jnp.asarray(rng.random(N), jnp.float32)
    rows = [jnp.asarray(rng.random(N), jnp.float32) for _ in range(10)]
    payload5 = tuple(jax.lax.complex(rows[2 * i], rows[2 * i + 1])
                     for i in range(5))

    @jax.jit
    def main_sort(t, d, *p):
        out = jax.lax.sort((t, d) + p, num_keys=2, is_stable=True)
        return sum(jnp.sum(jnp.abs(x).astype(jnp.float32)) if x.dtype == jnp.complex64
                   else jnp.sum(x.astype(jnp.float32)) for x in out)

    a = jnp.asarray(rng.random((2048, 2048)), jnp.float32)

    @jax.jit
    def mm(a):
        return jnp.sum(a @ a)

    print(f"matmul 2048^3 (~17 GFLOP): {timed_blocked(mm, a):7.2f} ms")
    print(f"main sort + checksum     : {timed_blocked(main_sort, tile, depth, *payload5):7.2f} ms")

    # trace one sort
    out_dir = "/tmp/sort_trace"
    jax.block_until_ready(main_sort(tile, depth, *payload5))
    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        r = main_sort(tile, depth, *payload5)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True)
    tot = {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "sort" in ev.get("name", "").lower():
                tot[ev["name"]] = tot.get(ev["name"], 0.0) + ev.get("dur", 0) / 1e3
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:5]:
        print(f"traced {k}: {v / 3:7.2f} ms/iter")


if __name__ == "__main__":
    main()
