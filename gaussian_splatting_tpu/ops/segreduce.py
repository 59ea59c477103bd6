"""Streaming instance->Gaussian gradient reduction (Pallas TPU kernel).

Round-3 replacement for the segmented-cumsum + segment-end-gather pair in
the rasterizer VJP (ops/segscan.py + an ~8.8 ms/iter XLA lane gather at
bench scale): per-instance gradient rows in expansion order are reduced to
per-Gaussian sums DIRECTLY, on the MXU, written field-major (16, P) — the
exact layout the VJP hands back (the old path materialized the full (16, N)
prefix-sum array only to gather one column per Gaussian from it).

Key structural facts this kernel exploits:

- Expansion order is MONOTONE in Gaussian index, and — because every
  Gaussian owns >= 1 slot (zero-tile Gaussians emit one sentinel instance,
  see ops/expand.py) — the slot->Gaussian map is DENSE: 128 consecutive
  slots span at most 128 consecutive Gaussians, and the per-chunk output
  window advances by at most one 128-row window per chunk.
- A chunk's contribution to its 256-wide Gaussian window is one one-hot
  contraction: grads(16,128) @ onehot(128,256), exact via the 3-way bf16
  split (zero columns stay EXACTLY zero — Adam turns gradient dust into
  full-size steps, so untouched Gaussians must get bit-zero gradients).
- Accumulation across chunks happens in a rolling two-half staging buffer
  flushed with 128-aligned DMA (the discipline proven in
  ops/blend_pallas._backward_kernel_compact, including the drain-zeroing).

Reference semantics anchor: this is the atomicAdd-free replacement of the
per-Gaussian gradient accumulation in backward.cu:592-609.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
MAX_ROWS = 16  # VMEM staging sanity bound; callers pass 10 real rows

_SM_CURW, _SM_PEND0, _SM_PEND1, _SM_WIN0, _SM_WIN1 = range(5)


def _dot_rhs01(x, onehot):
    """x @ onehot for 0/1 ``onehot``: 2-pass hi+mid bf16 split (16 mantissa
    bits, ~2^-16 relative — the grad budget is 3e-4).  Zero columns stay
    EXACTLY zero (0 splits to 0+0), which is the property Adam needs."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    mid = x - hi
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(hi, onehot) + d(mid, onehot)


def _segreduce_kernel(
    base_ref,  # (nchunks,) int32 scalar prefetch: g_exp[c*128] // 128
    vals_ref,  # (ROWS, t_per*CHUNK) VMEM block — expansion-order grads
    g_ref,  # (1, t_per*CHUNK) int32 VMEM block — owning Gaussian per slot
    out_hbm,  # (ROWS, P_out) HBM output
    staging,  # (2, ROWS, CHUNK) VMEM
    flush_sems,  # (2,) DMA semaphores
    sm,  # SMEM (8,) int32: cur_w, pend0, pend1, win0, win1
    *,
    nchunks: int,
    t_per: int,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        staging[...] = jnp.zeros_like(staging)
        sm[_SM_CURW] = 0
        sm[_SM_PEND0] = 0
        sm[_SM_PEND1] = 0

    def flush_copy(h, w):
        return pltpu.make_async_copy(
            staging.at[h],
            out_hbm.at[:, pl.ds(w * CHUNK, CHUNK)],
            flush_sems.at[h],
        )

    jj = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 2 * CHUNK), 1)

    for t in range(t_per):
        c = pl.program_id(0) * t_per + t

        @pl.when(c < nchunks)
        def _():
            w0 = base_ref[c]
            cur_w = sm[_SM_CURW]

            # windows strictly below this chunk's base are final (bases are
            # non-decreasing and advance by <= 1 per chunk)
            @pl.when(w0 > cur_w)
            def _():
                h = jax.lax.rem(cur_w, 2)

                @pl.when(sm[_SM_PEND0 + h] == 1)
                def _():
                    flush_copy(h, sm[_SM_WIN0 + h]).wait()
                    staging[h] = jnp.zeros_like(staging[h])
                    sm[_SM_PEND0 + h] = 0

                flush_copy(h, cur_w).start()
                sm[_SM_PEND0 + h] = 1
                sm[_SM_WIN0 + h] = cur_w
                sm[_SM_CURW] = cur_w + 1

            g = g_ref[0, t * CHUNK : (t + 1) * CHUNK]  # (CHUNK,)
            gblock = vals_ref[:, t * CHUNK : (t + 1) * CHUNK]  # (ROWS, CHUNK)
            # onehot[i, j] = 1 where slot i's Gaussian lands at window pos j
            rel = g[:, None] - w0 * CHUNK  # (CHUNK, 1), in [0, 256)
            sel = (jj == rel).astype(jnp.float32)  # (CHUNK, 2*CHUNK)
            contrib = _dot_rhs01(gblock, sel)  # (ROWS, 2*CHUNK)

            # any pending flush on either half must land before adding
            for h in (0, 1):
                @pl.when(sm[_SM_PEND0 + h] == 1)
                def _():
                    flush_copy(h, sm[_SM_WIN0 + h]).wait()
                    staging[h] = jnp.zeros_like(staging[h])
                    sm[_SM_PEND0 + h] = 0

            hA = jax.lax.rem(w0, 2)
            staging[hA] = staging[hA] + contrib[:, :CHUNK]
            hB = 1 - hA
            staging[hB] = staging[hB] + contrib[:, CHUNK:]

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        # Drain: flush EVERY remaining window [cur_w, nwin).  Normally the
        # stream's last base is P // 128 (g_exp is dense through the
        # terminator) so this is two flushes; under instance-buffer overflow
        # the stream stops early and the rest must still be written (zeros)
        # or the VJP would read uninitialized HBM.  A pending flush means no
        # adds landed on that half since it started, so its staging is stale
        # and must be zeroed before reuse (cf. the blend_pallas drain fix);
        # cur_w / cur_w+1's halves flush their genuine accumulations first.
        nwin_total = out_hbm.shape[1] // CHUNK

        def drain_body(w, _):
            h = jax.lax.rem(w, 2)

            @pl.when(sm[_SM_PEND0 + h] == 1)
            def _():
                flush_copy(h, sm[_SM_WIN0 + h]).wait()
                staging[h] = jnp.zeros_like(staging[h])
                sm[_SM_PEND0 + h] = 0

            flush_copy(h, w).start()
            sm[_SM_PEND0 + h] = 1
            sm[_SM_WIN0 + h] = w
            return 0

        jax.lax.fori_loop(sm[_SM_CURW], nwin_total, drain_body, 0)
        for h in (0, 1):
            @pl.when(sm[_SM_PEND0 + h] == 1)
            def _():
                flush_copy(h, sm[_SM_WIN0 + h]).wait()
                sm[_SM_PEND0 + h] = 0


def segment_reduce_rows(
    vals: jnp.ndarray,  # (ROWS, N) expansion-order gradient rows
    g_exp: jnp.ndarray,  # (N,) int32 owning Gaussian per slot (dense, monotone)
    num_gaussians: int,
    *,
    t_per: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-Gaussian sums, shape (rows, P_out) with P_out >= num_gaussians + 1
    (row P collects the terminator tail's zeros).  Rows [0, num_gaussians)
    are the per-Gaussian gradient totals."""
    rows, n = vals.shape
    assert rows <= MAX_ROWS and n % CHUNK == 0
    nchunks = n // CHUNK
    # output covers every window the stream can touch: g <= num_gaussians
    # (terminator), window base <= P//128, +1 window for the second half
    p_out = (num_gaussians // CHUNK + 2) * CHUNK
    bases = g_exp[:: CHUNK] // CHUNK  # (nchunks,) — non-decreasing, steps <= 1
    nprog = -(-nchunks // t_per)
    pad = nprog * t_per * CHUNK - n
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
        # padded slots must not contribute: send them to the terminator
        # window with zero values (pad g with the last base's window)
        g_exp = jnp.pad(g_exp, (0, pad), mode="edge")
        bases = g_exp[:: CHUNK] // CHUNK
    kernel = functools.partial(_segreduce_kernel, nchunks=nchunks, t_per=t_per)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((rows, t_per * CHUNK), lambda i, b_: (0, i)),
            pl.BlockSpec((1, t_per * CHUNK), lambda i, b_: (0, i)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((8,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, p_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(bases.astype(jnp.int32), vals, g_exp[None].astype(jnp.int32))
