#!/usr/bin/env python
"""Probe: can a Pallas kernel turn (tiles, 256, 8) packed blend output into
(5, gy, 16, W) image layout cheaper than XLA's untile transpose (~3.2 ms/dir
at bench scale)?  The open question is Mosaic's cost for the per-tile
(256, 8) -> (5, 16, 16) relayout."""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

GY, GX = 68, 120
T_PER = 8
PIX, COLS, IM = 256, 8, 5
W = GX * 16

x = jax.random.normal(jax.random.PRNGKey(0), (GY * GX, PIX, COLS), jnp.float32)


def untile_xla(p):
    img = p[:, :, :IM].reshape(GY, GX, 16, 16, IM)
    return img.transpose(4, 0, 2, 1, 3).reshape(IM, GY * 16, W)


def kernel(x_ref, o_ref):
    for t in range(T_PER):
        st = x_ref[t]  # (256, 8)
        img = st.reshape(16, 16, COLS)  # free: splits the major dim
        img = jnp.transpose(img, (2, 0, 1))  # relayout under test
        o_ref[:, 0, :, t * 16 : (t + 1) * 16] = img[:IM]


def untile_pallas(p):
    return pl.pallas_call(
        kernel,
        grid=(GY, GX // T_PER),
        in_specs=[
            pl.BlockSpec((T_PER, PIX, COLS), lambda y, xg: (y * (GX // T_PER) + xg, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (IM, 1, 16, T_PER * 16), lambda y, xg: (0, y, 0, xg)
        ),
        out_shape=jax.ShapeDtypeStruct((IM, GY, 16, W), jnp.float32),
    )(p)


def timeit(name, fn, n=20):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(x)
    jax.block_until_ready(out)
    print(f"{name:>12}: {(time.perf_counter()-t0)/n*1e3:7.2f} ms", flush=True)
    return out


a = timeit("xla", untile_xla)
try:
    b = timeit("pallas", untile_pallas)
    import numpy as np
    bb = np.asarray(b).reshape(IM, GY * 16, W)
    np.testing.assert_array_equal(np.asarray(a), bb)
    print("parity OK")
except Exception as e:
    print("pallas variant failed:", type(e).__name__, str(e)[:500])
