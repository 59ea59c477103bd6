"""Pallas TPU kernels for the tile-based alpha-blend forward and backward.

TPU-native redesign of the reference's ``renderCUDA`` forward
(forward.cu:367-513) and backward (backward.cu:433-612):

- Grid = one program per 16x16 tile (TPU grids run sequentially with DMA
  pipelining, so per-tile dynamic trip counts give total-work scaling, unlike
  a vmapped max-padded loop).
- Instances are consumed 128 at a time (the lane dimension) from a
  field-major (NUM_FIELDS, capacity) record array in HBM, double-buffered
  into VMEM with explicit async copies.  The binning stage lays instances out
  *chunk-aligned* per tile so every DMA offset is provably 128-aligned.
- The per-pixel sequential front-to-back compositing is vectorized across a
  (256 pixels, 128 instances) block: transmittance uses an exclusive prefix
  product (Hillis-Steele, log2(chunk) shift-multiply steps along lanes), and
  the per-pixel early-stop (``test_T < 1e-4`` -> done, forward.cu:477-482)
  becomes a cumulative-or suppression mask.
- Per-pixel accumulator state (T, RGB, inverse depth, contributor count,
  done) lives in the VMEM output block / a VMEM scratch, NOT in loop
  carries: (pix, 1) vector carries cost 32 vregs each and trip Mosaic layout
  legalization in ``scf.yield``.
- The backward is a *forward replay*: instead of the reference's
  back-to-front traversal with trailing ``accum_rec`` sums and per-Gaussian
  atomicAdd, we use suffix = total - prefix (totals come from the saved
  forward outputs) and write gradients **per instance slot** — each instance
  belongs to exactly one tile, so slots are disjoint and no atomics exist
  anywhere.  Instance->Gaussian reduction happens outside as the autodiff
  VJP of the gather that built the record array (a deterministic XLA
  scatter-add).

Gradient semantics match autodiff of the dense oracle
(gaussian_splatting_tpu.ops.oracle), including zero gradient through the
alpha = min(0.99, op*G) cap (see oracle.py docstring for the one deliberate
deviation from backward.cu:600-609).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
ALPHA_CAP = 0.99
T_EPS = 1e-4

# Field-major instance record layout (rows of the (NUM_FIELDS, capacity) array)
F_X, F_Y, F_CA, F_CB, F_CC, F_OP, F_R, F_G, F_B, F_INVD = range(10)
NUM_FIELDS = 16  # padded for alignment

# Packed forward output columns: (num_tiles, PIX, OUT_COLS)
# column 6 doubles as the per-pixel done flag while the kernel is running.
O_R, O_G, O_B, O_T, O_INVD, O_NCONTRIB, O_DONE = range(7)
OUT_COLS = 8

# Packed cotangent columns: (num_tiles, PIX, CT_COLS)
CT_R, CT_G, CT_B, CT_INVD, CT_BGDOT = range(5)
CT_COLS = 8

# Backward replay state columns (VMEM scratch)
S_T, S_BR, S_BG, S_BB, S_BI = range(5)
STATE_COLS = 8


def _shift_lanes(x: jnp.ndarray, s: int, fill: float) -> jnp.ndarray:
    """Shift right by s along the last (lane) axis, filling with ``fill``."""
    pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-s]], axis=-1)


def _exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix product along lanes (Hillis-Steele)."""
    n = x.shape[-1]
    out = _shift_lanes(x, 1, 1.0)
    s = 1
    while s < n:
        out = out * _shift_lanes(out, s, 1.0)
        s *= 2
    return out


def _inclusive_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along lanes (Hillis-Steele)."""
    n = x.shape[-1]
    out = x
    s = 1
    while s < n:
        out = out + _shift_lanes(out, s, 0.0)
        s *= 2
    return out


def _last_lane(x: jnp.ndarray) -> jnp.ndarray:
    """x[..., -1:] via a masked reduction (canonical Mosaic layout)."""
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.sum(jnp.where(lane == n - 1, x, 0.0), axis=-1, keepdims=True)


def _row_prod(x: jnp.ndarray) -> jnp.ndarray:
    """Product along lanes, keepdims — Mosaic has no reduce_prod primitive."""
    n = x.shape[-1]
    out = x
    s = 1
    while s < n:
        out = out * _shift_lanes(out, s, 1.0)
        s *= 2
    return _last_lane(out)


def _suppressed(bad: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative-or along lanes: True at/after the first True."""
    n = bad.shape[-1]
    out = bad
    s = 1
    while s < n:
        out = out | (_shift_lanes(out.astype(jnp.float32), s, 0.0) > 0.0)
        s *= 2
    return out


def _tile_pixel_coords(tile_id, grid_x: int, tile_w: int, tile_h: int):
    """Float pixel coordinates of this tile's pixels, shape (PIX, 1)."""
    pix = tile_w * tile_h
    ty = tile_id // grid_x
    tx = tile_id % grid_x
    idx = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = (tx * tile_w + idx % tile_w).astype(jnp.float32)
    py = (ty * tile_h + idx // tile_w).astype(jnp.float32)
    return px, py


def _chunk_alpha(meta, px, py, n_in_chunk, chunk):
    """Per-(pixel, instance) alpha for one chunk.

    meta: (NUM_FIELDS, chunk) VMEM slab; px/py: (PIX, 1).
    Returns (alpha_eff, eligible, not_capped, G, dx, dy); alpha_eff is zero
    where not eligible.  Skip semantics match forward.cu:462-476.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    in_range = lane < n_in_chunk  # (1, chunk)

    x = meta[F_X, :][None, :]
    y = meta[F_Y, :][None, :]
    ca = meta[F_CA, :][None, :]
    cb = meta[F_CB, :][None, :]
    cc = meta[F_CC, :][None, :]
    op = meta[F_OP, :][None, :]

    dx = x - px  # (PIX, chunk)
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    raw = op * G
    alpha = jnp.minimum(ALPHA_CAP, raw)
    eligible = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_range
    alpha_eff = jnp.where(eligible, alpha, 0.0)
    not_capped = raw < ALPHA_CAP
    return alpha_eff, eligible, not_capped, G, dx, dy


def _col(state: jnp.ndarray, i: int) -> jnp.ndarray:
    """Column i of a (pix, COLS) state block as (pix, 1)."""
    return state[:, i : i + 1]


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def _forward_kernel(
    starts_ref,  # (num_tiles,) int32, scalar-prefetched into SMEM
    ends_ref,  # (num_tiles,) int32
    meta_hbm,  # (NUM_FIELDS, cap_padded) HBM
    out_ref,  # (1, PIX, OUT_COLS) VMEM — doubles as accumulator state
    meta_vmem,  # (2, NUM_FIELDS, chunk) VMEM scratch
    sems,  # (2,) DMA semaphores
    *,
    grid_x: int,
    tile_w: int,
    tile_h: int,
    chunk: int,
):
    pix = tile_w * tile_h
    tile_id = pl.program_id(0)
    # tile ranges are chunk-aligned by construction (binning relayout); the
    # hint lets Mosaic prove the DMA lane offsets are 128-divisible.
    start = pl.multiple_of(starts_ref[tile_id], chunk)
    end = ends_ref[tile_id]
    nchunks = pl.cdiv(end - start, chunk)

    px, py = _tile_pixel_coords(tile_id, grid_x, tile_w, tile_h)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (pix, OUT_COLS), 1)

    # init state: T=1, everything else 0
    out_ref[0] = jnp.where(lane8 == O_T, 1.0, 0.0)

    def chunk_dma(slot, c):
        return pltpu.make_async_copy(
            meta_hbm.at[:, pl.ds(start + c * chunk, chunk)],
            meta_vmem.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        chunk_dma(0, 0).start()

    def body(state):
        c, _alldone = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            chunk_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        chunk_dma(slot, c).wait()
        meta = meta_vmem[slot]

        st = out_ref[0]  # (pix, OUT_COLS)
        T = _col(st, O_T)
        done = _col(st, O_DONE) > 0.0

        n_in_chunk = end - start - c * chunk
        alpha, eligible, _ncap, _G, _dx, _dy = _chunk_alpha(
            meta, px, py, n_in_chunk, chunk
        )

        om = 1.0 - alpha
        E = _exclusive_cumprod(om)  # prod of (1-a_j), j<k within chunk
        T_before = T * E
        test_T = T_before * om
        bad = eligible & (test_T < T_EPS)
        supp = _suppressed(bad)
        contrib = eligible & (~supp) & (~done)
        w = jnp.where(contrib, alpha * T_before, 0.0)

        r = meta[F_R, :][None, :]
        g = meta[F_G, :][None, :]
        b = meta[F_B, :][None, :]
        iv = meta[F_INVD, :][None, :]
        dCr = jnp.sum(w * r, axis=1, keepdims=True)
        dCg = jnp.sum(w * g, axis=1, keepdims=True)
        dCb = jnp.sum(w * b, axis=1, keepdims=True)
        dinvd = jnp.sum(w * iv, axis=1, keepdims=True)

        # new transmittance: multiply contributing factors only
        T_new = T * _row_prod(jnp.where(contrib, om, 1.0))

        # last contributor position (1-based within the tile range)
        lane = jax.lax.broadcasted_iota(jnp.int32, (pix, chunk), 1)
        pos = (c * chunk + lane + 1).astype(jnp.float32)
        nc_new = jnp.maximum(
            _col(st, O_NCONTRIB),
            jnp.max(jnp.where(contrib, pos, 0.0), axis=1, keepdims=True),
        )
        done_new = jnp.where(
            done | jnp.any(bad, axis=1, keepdims=True), 1.0, 0.0
        )

        new_st = jnp.concatenate(
            [
                _col(st, O_R) + dCr,
                _col(st, O_G) + dCg,
                _col(st, O_B) + dCb,
                T_new,
                _col(st, O_INVD) + dinvd,
                nc_new,
                done_new,
                jnp.zeros((pix, 1), jnp.float32),
            ],
            axis=1,
        )
        out_ref[0] = new_st
        alldone = jnp.sum(done_new) >= float(pix)
        return c + 1, alldone

    def cond(state):
        c, alldone = state
        return (c < nchunks) & jnp.logical_not(alldone)

    c_final, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))

    # Drain the prefetch issued by the last executed iteration (early exit
    # leaves chunk c_final's DMA in flight).
    @pl.when(c_final < nchunks)
    def _():
        chunk_dma(jax.lax.rem(c_final, 2), c_final).wait()


def blend_forward_pallas(
    meta: jnp.ndarray,  # (NUM_FIELDS, cap_padded) field-major instance records
    tile_starts: jnp.ndarray,  # (num_tiles,) — multiples of chunk
    tile_ends: jnp.ndarray,  # (num_tiles,) — start + true count
    *,
    grid_x: int,
    grid_y: int,
    tile_w: int = 16,
    tile_h: int = 16,
    chunk: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the forward blend. Returns packed (num_tiles, PIX, OUT_COLS)."""
    num_tiles = grid_x * grid_y
    pix = tile_w * tile_h
    kernel = functools.partial(
        _forward_kernel, grid_x=grid_x, tile_w=tile_w, tile_h=tile_h, chunk=chunk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, pix, OUT_COLS), lambda t, s_, e_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FIELDS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, pix, OUT_COLS), jnp.float32),
        interpret=interpret,
    )(tile_starts.astype(jnp.int32), tile_ends.astype(jnp.int32), meta)


# --------------------------------------------------------------------------
# Backward
# --------------------------------------------------------------------------


def _backward_kernel(
    starts_ref,  # (num_tiles,) int32, scalar-prefetched into SMEM
    ends_ref,  # (num_tiles,) int32
    meta_hbm,  # (NUM_FIELDS, cap_padded) HBM
    fwd_ref,  # (1, PIX, OUT_COLS) VMEM: packed forward outputs
    ct_ref,  # (1, PIX, CT_COLS) VMEM: packed cotangents
    grad_hbm,  # out (NUM_FIELDS, cap_padded) HBM
    state_ref,  # (PIX, STATE_COLS) VMEM scratch: forward-replay accumulators
    meta_vmem,  # (2, NUM_FIELDS, chunk) scratch
    grad_vmem,  # (2, NUM_FIELDS, chunk) scratch
    in_sems,  # (2,) DMA semaphores
    out_sems,  # (2,) DMA semaphores
    *,
    grid_x: int,
    tile_w: int,
    tile_h: int,
    chunk: int,
):
    pix = tile_w * tile_h
    tile_id = pl.program_id(0)
    start = pl.multiple_of(starts_ref[tile_id], chunk)
    end = ends_ref[tile_id]

    px, py = _tile_pixel_coords(tile_id, grid_x, tile_w, tile_h)

    fwd = fwd_ref[0]  # (PIX, OUT_COLS)
    T_final = _col(fwd, O_T)
    C_tot_r = _col(fwd, O_R)
    C_tot_g = _col(fwd, O_G)
    C_tot_b = _col(fwd, O_B)
    invd_tot = _col(fwd, O_INVD)
    n_contrib = _col(fwd, O_NCONTRIB)  # float, 1-based last contributor

    ct = ct_ref[0]
    dC_r = _col(ct, CT_R)
    dC_g = _col(ct, CT_G)
    dC_b = _col(ct, CT_B)
    dinvd = _col(ct, CT_INVD)
    ct_T = _col(ct, CT_BGDOT)  # cotangent of final_T (carries the bg term)

    # Every chunk of this tile's range is processed and written (tail chunks
    # naturally produce zero gradients); slots not covered by any tile are
    # masked by the caller via total_aligned.
    nchunks = pl.cdiv(end - start, chunk)

    # replay state: T=1, prefix sums 0
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (pix, STATE_COLS), 1)
    state_ref[:] = jnp.where(lane_s == S_T, 1.0, 0.0)

    def in_dma(slot, c):
        return pltpu.make_async_copy(
            meta_hbm.at[:, pl.ds(start + c * chunk, chunk)],
            meta_vmem.at[slot],
            in_sems.at[slot],
        )

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            grad_vmem.at[slot],
            grad_hbm.at[:, pl.ds(start + c * chunk, chunk)],
            out_sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        in_dma(0, 0).start()

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            in_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        in_dma(slot, c).wait()
        # Reusing grad_vmem[slot]: wait for the write-out from 2 chunks ago.
        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2).wait()

        st = state_ref[:]
        T = _col(st, S_T)
        Br = _col(st, S_BR)
        Bg = _col(st, S_BG)
        Bb = _col(st, S_BB)
        Bi = _col(st, S_BI)

        meta = meta_vmem[slot]
        n_in_chunk = end - start - c * chunk
        alpha, eligible, not_capped, G, dx, dy = _chunk_alpha(
            meta, px, py, n_in_chunk, chunk
        )

        lane = jax.lax.broadcasted_iota(jnp.int32, (pix, chunk), 1)
        pos = (c * chunk + lane).astype(jnp.float32)  # 0-based position
        contrib = eligible & (pos < n_contrib)
        a = jnp.where(contrib, alpha, 0.0)

        om = 1.0 - a
        E = _exclusive_cumprod(om)
        T_before = T * E  # true transmittance at each contributing instance
        w = a * T_before

        r = meta[F_R, :][None, :]
        g = meta[F_G, :][None, :]
        b = meta[F_B, :][None, :]
        iv = meta[F_INVD, :][None, :]

        # inclusive prefix sums of blended weight*value within chunk + carry
        Br_in = Br + _inclusive_cumsum(w * r)
        Bg_in = Bg + _inclusive_cumsum(w * g)
        Bb_in = Bb + _inclusive_cumsum(w * b)
        Bi_in = Bi + _inclusive_cumsum(w * iv)

        # dC/da_k = c_k T_k - suffix_k/(1-a_k) - T_final*ct_T/(1-a_k), where
        # suffix_k = C_total - prefix_incl(k)  (equivalent to the reference's
        # accum_rec formulation, backward.cu:556-590; see module docstring).
        inv_om = 1.0 / om
        dL_da = (
            (r * T_before - (C_tot_r - Br_in) * inv_om) * dC_r
            + (g * T_before - (C_tot_g - Bg_in) * inv_om) * dC_g
            + (b * T_before - (C_tot_b - Bb_in) * inv_om) * dC_b
            + (iv * T_before - (invd_tot - Bi_in) * inv_om) * dinvd
            - T_final * inv_om * ct_T
        )
        dL_da = jnp.where(contrib, dL_da, 0.0)

        op = meta[F_OP, :][None, :]
        # alpha = min(0.99, op*G): zero grad through the capped branch.
        dL_dG_pix = jnp.where(not_capped, op * dL_da, 0.0)
        dL_dop = jnp.sum(jnp.where(not_capped, G * dL_da, 0.0), axis=0, keepdims=True)

        ca = meta[F_CA, :][None, :]
        cb = meta[F_CB, :][None, :]
        cc = meta[F_CC, :][None, :]
        gl = dL_dG_pix * G
        # d(power)/d(mean2d): d = xy - pix so d/dxy = d/d(delta)
        dL_dx = jnp.sum(gl * (-(ca * dx + cb * dy)), axis=0, keepdims=True)
        dL_dy = jnp.sum(gl * (-(cc * dy + cb * dx)), axis=0, keepdims=True)
        dL_dca = jnp.sum(gl * (-0.5 * dx * dx), axis=0, keepdims=True)
        dL_dcb = jnp.sum(gl * (-dx * dy), axis=0, keepdims=True)
        dL_dcc = jnp.sum(gl * (-0.5 * dy * dy), axis=0, keepdims=True)

        dL_dr = jnp.sum(w * dC_r, axis=0, keepdims=True)
        dL_dg = jnp.sum(w * dC_g, axis=0, keepdims=True)
        dL_db = jnp.sum(w * dC_b, axis=0, keepdims=True)
        dL_div = jnp.sum(w * dinvd, axis=0, keepdims=True)

        zrow = jnp.zeros_like(dL_dx)
        grad_vmem[slot] = jnp.concatenate(
            [
                dL_dx,
                dL_dy,
                dL_dca,
                dL_dcb,
                dL_dcc,
                dL_dop,
                dL_dr,
                dL_dg,
                dL_db,
                dL_div,
                zrow,
                zrow,
                zrow,
                zrow,
                zrow,
                zrow,
            ],
            axis=0,
        )
        out_dma(slot, c).start()

        new_state = jnp.concatenate(
            [
                T * _row_prod(om),
                _last_lane(Br_in),
                _last_lane(Bg_in),
                _last_lane(Bb_in),
                _last_lane(Bi_in),
                jnp.zeros((pix, STATE_COLS - 5), jnp.float32),
            ],
            axis=1,
        )
        state_ref[:] = new_state
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    # Drain outstanding gradient write-outs (last one or two chunks).
    @pl.when(nchunks > 1)
    def _():
        out_dma(jax.lax.rem(nchunks - 2, 2), nchunks - 2).wait()

    @pl.when(nchunks > 0)
    def _():
        out_dma(jax.lax.rem(nchunks - 1, 2), nchunks - 1).wait()


def blend_backward_pallas(
    meta: jnp.ndarray,
    tile_starts: jnp.ndarray,
    tile_ends: jnp.ndarray,
    fwd_packed: jnp.ndarray,  # (num_tiles, PIX, OUT_COLS)
    ct_packed: jnp.ndarray,  # (num_tiles, PIX, CT_COLS)
    *,
    grid_x: int,
    grid_y: int,
    tile_w: int = 16,
    tile_h: int = 16,
    chunk: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-instance-slot gradients, shape (NUM_FIELDS, cap_padded).

    Slots within a tile range are always written (zeros where nothing
    contributed); slots beyond the chunk-aligned written region are left
    *undefined* — callers mask by ``slot < total_aligned`` before reducing.
    """
    num_tiles = grid_x * grid_y
    pix = tile_w * tile_h
    kernel = functools.partial(
        _backward_kernel, grid_x=grid_x, tile_w=tile_w, tile_h=tile_h, chunk=chunk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, pix, OUT_COLS), lambda t, s_, e_: (t, 0, 0)),
            pl.BlockSpec((1, pix, CT_COLS), lambda t, s_, e_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((pix, STATE_COLS), jnp.float32),
            pltpu.VMEM((2, NUM_FIELDS, chunk), jnp.float32),
            pltpu.VMEM((2, NUM_FIELDS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(meta.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_starts.astype(jnp.int32), tile_ends.astype(jnp.int32), meta, fwd_packed, ct_packed)
