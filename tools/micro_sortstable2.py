#!/usr/bin/env python
"""Trace-based stable-vs-unstable sort comparison (wall timings are bogus on
the tunnel backend — device trace self-time is the only ground truth)."""

import glob
import gzip
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

N = 2_089_472


def trace_ms(fn, args, tag):
    out_dir = f"/tmp/sorttr_{tag}"
    jax.block_until_ready(fn(*args))
    jax.profiler.start_trace(out_dir)
    r = None
    for _ in range(3):
        r = fn(*args)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    best = 0.0
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            nm = ev.get("name", "")
            if ev.get("ph") == "X" and nm.startswith("sort."):
                best += ev.get("dur", 0) / 1e3
    return best / 3


def main():
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, 8160, N), jnp.int32)
    depth = jnp.asarray(rng.random(N), jnp.float32)
    perm = jnp.asarray(rng.permutation(N), jnp.int32)
    rows = [jnp.asarray(rng.random(N), jnp.float32) for _ in range(10)]
    p5 = tuple(jax.lax.complex(rows[2 * i], rows[2 * i + 1]) for i in range(5))

    def mk(num_keys, stable):
        @jax.jit
        def f(*ops):
            return jax.lax.sort(ops, num_keys=num_keys, is_stable=stable)
        return f

    cases = [
        ("main stable    ", mk(2, True), (tile, depth) + p5),
        ("main unstable  ", mk(2, False), (tile, depth) + p5),
        ("reorder stable ", mk(1, True), (perm,) + p5),
        ("reorder unstbl ", mk(1, False), (perm,) + p5),
        ("main 3key(+src)", mk(2, True), (tile, depth, rows[0]) + p5[:4] + (rows[9],)),
    ]
    for name, fn, args in cases:
        print(f"{name}: {trace_ms(fn, args, name.strip().replace(' ', '_')):7.2f} ms/iter (trace)", flush=True)


if __name__ == "__main__":
    main()
