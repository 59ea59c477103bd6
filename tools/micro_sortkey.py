#!/usr/bin/env python
"""Main-sort key packing probe: (tile i32, depth f32) two-key sort vs ONE
complex64 lexicographic key.  Payload = 5 c64 operands (the real pipeline's
blend fields + src), N = bench-scale instance count."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = 2_089_472
NUM_TILES = 8160

rng = np.random.default_rng(0)
tile = jnp.asarray(rng.integers(0, NUM_TILES + 1, N), jnp.int32)
depth = jnp.asarray(rng.uniform(0.3, 50.0, N), jnp.float32)
pay = [jnp.asarray(rng.normal(size=N), jnp.float32) for _ in range(10)]
packed5 = tuple(jax.lax.complex(pay[2 * i], pay[2 * i + 1]) for i in range(5))


@jax.jit
def two_key(tile, depth, *p5):
    out = jax.lax.sort((tile, depth) + p5, num_keys=2, is_stable=True)
    return out[0], out[1], out[2]


@jax.jit
def one_key(tile, depth, *p5):
    key = jax.lax.complex(tile.astype(jnp.float32), depth)
    out = jax.lax.sort((key,) + p5, num_keys=1, is_stable=True)
    return jnp.real(out[0]).astype(jnp.int32), jnp.imag(out[0]), out[1]


def timeit(name, fn, *a, n=10):
    out = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
        float(jnp.sum(out[2].real))  # host pull: defeats any dispatch elision
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:>12}: {dt:8.2f} ms (incl host pull)", flush=True)
    return out


a = timeit("two_key", two_key, tile, depth, *packed5)
b = timeit("one_key", one_key, tile, depth, *packed5)
print("tile match:", bool(jnp.array_equal(a[0], b[0])))
print("depth match:", bool(jnp.array_equal(a[1], b[1])))
print("pay match:", bool(jnp.array_equal(a[2], b[2])))
