#!/usr/bin/env python
"""Does is_stable=False drop XLA's internal iota tiebreak operand on TPU?

Measures the bench-shape reorder sort (1 permutation key + 5 c64 payloads)
and the main sort (2 keys + 5 c64) stable vs unstable, and dumps the HLO
operand count to confirm whether the iota disappears.
"""

import time

import jax
import jax.numpy as jnp

N = 2_089_472


def timed(fn, *args):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, N).astype(jnp.int32)
    rows = [jax.random.normal(jax.random.PRNGKey(i), (N,), jnp.float32)
            for i in range(10)]
    payload5 = tuple(jax.lax.complex(rows[2 * i], rows[2 * i + 1])
                     for i in range(5))
    tile = jax.random.randint(jax.random.PRNGKey(99), (N,), 0, 8160,
                              dtype=jnp.int32)
    depth = jax.random.uniform(jax.random.PRNGKey(98), (N,)) * 10.0

    @jax.jit
    def reorder_stable(k, *p):
        return jax.lax.sort((k,) + p, num_keys=1, is_stable=True)

    @jax.jit
    def reorder_unstable(k, *p):
        return jax.lax.sort((k,) + p, num_keys=1, is_stable=False)

    @jax.jit
    def main_stable(t, d, *p):
        return jax.lax.sort((t, d) + p, num_keys=2, is_stable=True)

    @jax.jit
    def main_unstable(t, d, *p):
        return jax.lax.sort((t, d) + p, num_keys=2, is_stable=False)

    for name, fn, args in [
        ("reorder stable  ", reorder_stable, (perm,) + payload5),
        ("reorder unstable", reorder_unstable, (perm,) + payload5),
        ("main sort stable  ", main_stable, (tile, depth) + payload5),
        ("main sort unstable", main_unstable, (tile, depth) + payload5),
    ]:
        ms = timed(fn, *args)
        hlo = fn.lower(*args).compile().as_text()
        nsorts = hlo.count(" sort(")
        print(f"{name}: {ms:8.2f} ms   (hlo sort ops: {nsorts})")

    # correctness: unstable reorder must equal stable (keys are a permutation)
    a = reorder_stable(perm, *payload5)
    b = reorder_unstable(perm, *payload5)
    same = all(bool(jnp.all(x == y)) for x, y in zip(a, b))
    print("reorder unstable == stable:", same)


if __name__ == "__main__":
    main()
