"""Measure lax.sort payload cost: N f32 operands vs N/2 complex64-packed.

The instance pipeline's two sorts (main payload sort + VJP reorder sort)
carry ~10 f32 payload operands each at ~1.85 ms/operand (measured round 2,
tools/micro_sortgather*.py).  If that cost is per-OPERAND overhead rather
than per-byte, packing two f32 rows into one complex64 operand (bit-exact:
payloads are carried, never compared) halves it.  Run on the TPU:

    python tools/micro_sortpack.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_250_000
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, 8160, n), jnp.int32)
    depth = jnp.asarray(rng.random(n), jnp.float32)
    rows = [jnp.asarray(rng.random(n), jnp.float32) for _ in range(10)]

    @jax.jit
    def key_only(t, d):
        return jax.lax.sort((t, d), num_keys=2, is_stable=True)

    @jax.jit
    def flat(t, d, *rs):
        return jax.lax.sort((t, d) + rs, num_keys=2, is_stable=True)

    @jax.jit
    def packed(t, d, *rs):
        cs = tuple(
            jax.lax.complex(rs[2 * i], rs[2 * i + 1]) for i in range(len(rs) // 2)
        )
        out = jax.lax.sort((t, d) + cs, num_keys=2, is_stable=True)
        outs = []
        for c in out[2:]:
            outs.append(jnp.real(c))
            outs.append(jnp.imag(c))
        return out[:2] + tuple(outs)

    t_key, _ = bench(key_only, tile, depth)
    t_flat, o_flat = bench(flat, tile, depth, *rows)
    t_pack, o_pack = bench(packed, tile, depth, *rows)
    print(f"n={n}")
    print(f"2-key only              : {t_key:7.2f} ms")
    print(f"2 keys + 10 f32 payloads: {t_flat:7.2f} ms "
          f"({(t_flat - t_key) / 10:.2f} ms/operand)")
    print(f"2 keys + 5 c64 payloads : {t_pack:7.2f} ms "
          f"({(t_pack - t_key) / 5:.2f} ms/operand)")
    for a, b in zip(o_flat[2:], o_pack[2:]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("bit-exact roundtrip OK")


if __name__ == "__main__":
    main()
