"""Segmented inclusive cumsum along a long axis (Pallas TPU kernel).

Used by the rasterizer's instance->Gaussian gradient reduction: per-instance
gradient rows, laid out in expansion order (each Gaussian's instances
contiguous), are prefix-summed with resets at each Gaussian's first instance.
Taking the value at each segment's last row then yields the per-Gaussian
total — replacing both the reference backward's per-Gaussian atomicAdd
(backward.cu:592-609) and XLA's scatter-add (latency-bound on TPU).

A *sequential* left-to-right scan (grid steps run in order on TPU, carry in
VMEM scratch) matters for more than speed: tree-structured scans associate
shared prefixes differently per position, so differencing two prefixes
leaks O(eps * |prefix|) dust into segments whose true sum is zero.  With a
running carry, rows that add 0.0 leave the carry bit-identical, so
zero-gradient Gaussians get exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _segscan_kernel(vals_ref, flags_ref, out_ref, carry, *, rows: int, block: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    v = vals_ref[0]  # (rows, block)
    f = flags_ref[0]  # (1, block) — 1.0 at segment starts

    # lane-axis segmented Hillis-Steele: v[k] accumulates v[k-s] unless a
    # segment boundary lies in between (flag propagation or-s along).
    # Shift fill is 0 for both: out-of-block values contribute nothing and
    # the edge is not a boundary, so after log2(block) steps ff becomes the
    # prefix-or of the flags ("any segment start at or before this lane").
    ff = f
    s = 1
    while s < block:
        pad_v = jnp.zeros(v.shape[:-1] + (s,), v.dtype)
        pad_f = jnp.zeros(ff.shape[:-1] + (s,), ff.dtype)
        v_sh = jnp.concatenate([pad_v, v[..., :-s]], axis=-1)
        f_sh = jnp.concatenate([pad_f, ff[..., :-s]], axis=-1)
        v = v + jnp.where(ff > 0, 0.0, v_sh)
        ff = jnp.maximum(ff, f_sh)
        s *= 2

    # rows before the block's first flag continue the carried segment
    lane = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
    v = v + jnp.where(ff > 0, 0.0, carry[:, :1])

    out_ref[0] = v
    # new carry = running value at the last lane
    last = jnp.sum(jnp.where(lane == block - 1, 1.0, 0.0) * v, axis=-1, keepdims=True)
    carry[:, :1] = last


def segmented_cumsum(
    vals: jnp.ndarray,  # (rows, N) field-major values
    flags: jnp.ndarray,  # (N,) 1.0 at segment starts
    *,
    block: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inclusive segmented cumsum along axis 1, resetting where flags == 1."""
    rows, n = vals.shape
    pad = (-n) % block
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
        flags = jnp.pad(flags, (0, pad))
    nblocks = (n + pad) // block
    kernel = functools.partial(_segscan_kernel, rows=rows, block=block)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, rows, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, rows, n + pad), vals.dtype),
        scratch_shapes=[pltpu.VMEM((rows, 128), vals.dtype)],
        interpret=interpret,
    )(vals[None], flags[None, None].astype(vals.dtype))
    return out[0, :, :n]
