"""Pallas TPU kernels for the tile-based alpha-blend forward and backward.

TPU-native redesign of the reference's ``renderCUDA`` forward
(forward.cu:367-513) and backward (backward.cu:433-612):

- Grid = one program per group of ``t_per`` 16x16 tiles (TPU grids run
  sequentially with DMA pipelining, so per-tile dynamic trip counts give
  total-work scaling, unlike a vmapped max-padded loop).
- Instances are consumed ``chunk`` lanes at a time from the field-major
  (NUM_FIELDS, cap) SORTED COMPACT record array in HBM, double-buffered into
  VMEM with explicit async copies.  Tile ranges are gapless; each DMA reads
  the chunk-aligned window below the tile's start (provably 128-aligned)
  and the head lanes — the previous tile's instances — are masked to exact
  no-ops (round 4; replaces the round-2/3 aligned relayout kernel).
- The per-pixel sequential front-to-back compositing is vectorized across a
  (256 pixels, 128 instances) block: transmittance uses an exclusive prefix
  product computed as exp of an MXU prefix-sum of logs (both directions —
  the forward's 14-pass Hillis-Steele chain was retired in round 3 for a
  ~1e-7-relative rounding cost), and the per-pixel early-stop
  (``test_T < 1e-4`` -> done, forward.cu:477-482) becomes a single compare
  against the monotone test_T lane vector (see _forward_one_tile).  Prefix
  sums ride the MXU as x @
  upper-triangular-ones contractions with a 2-pass bf16 hi+err split
  (_dot_tri) — tri is exactly bf16 so that recovers ~f32 accuracy at a third
  of Precision.HIGHEST's cost; every conic/mean pixel reduction collapses
  into one pixel-moment contraction (Pmat) per chunk.
- Per-pixel accumulator state (T, RGB, inverse depth, contributor count,
  done) lives in the VMEM output block / a VMEM scratch, NOT in loop
  carries: (pix, 1) vector carries cost 32 vregs each and trip Mosaic layout
  legalization in ``scf.yield``.
- The backward is a *forward replay*: instead of the reference's
  back-to-front traversal with trailing ``accum_rec`` sums and per-Gaussian
  atomicAdd, we use suffix = total - prefix (totals come from the saved
  forward outputs) and write gradients **per instance slot** — each instance
  belongs to exactly one tile, so slots are disjoint and no atomics exist
  anywhere.  Instance->Gaussian reduction happens outside in the custom VJP
  of the gather that built the record array (a sequential Pallas segmented
  scan — see ops/segscan.py — deterministic, no scatter).

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
POWER_EPS = 1e-4  # eligibility slack over the exact power<=0 test (see _chunk_alpha)
BIG_T = 2.0  # > any transmittance; masks non-surviving lanes in the T min

# Field-major instance record layout (rows of the (NUM_FIELDS, capacity) array)
F_X, F_Y, F_CA, F_CB, F_CC, F_OP, F_R, F_G, F_B, F_INVD = range(10)
# 16 rows (10 real + 6 zero pad): Mosaic only DMAs 8- or 16-row HBM blocks
# (tools/micro_rowslice_probe.py), and the 10 blend fields don't fit 8.
NUM_FIELDS = 16

# Packed forward output columns: (num_tiles, PIX, OUT_COLS)
# O_NB is the per-pixel STREAM POSITION of the first lane whose test_T
# dropped below T_EPS (the reference's early-stop, forward.cu:477-482), or
# NB_BIG if the pixel never stopped.  One scalar replaces the round-1..4
# last-contributor max + done flag: the backward's contributor set is
# exactly ``eligible & (stream_pos < NB)`` (before_bad is a prefix property
# by test_T monotonicity), so the replay needs ONE integer compare and the
# forward drops a cross-lane min reduction + the done-flag update per chunk.
O_R, O_G, O_B, O_T, O_INVD, O_NB = range(6)
OUT_COLS = 8
# Finite infinity for NB: exact in f32 and > any stream position
# (instances.MAX_CAPACITY check guarantees capacity < 2^24).
NB_BIG = float(1 << 24)

# Packed cotangent columns — the first five forward output columns (the
# ones the render consumes: RGB, T, invdepth).  The render core outputs
# ONLY these five (the full packed block is a VJP residual), so the
# cotangent arrives 5-wide and no zero-pad for the internal
# O_NB column is ever materialized (a (tiles, 256, 8) pad
# measured 3.3 ms/iter at bench scale).
CT_R, CT_G, CT_B, CT_BGDOT, CT_INVD = O_R, O_G, O_B, O_T, O_INVD
CT_COLS = O_INVD + 1  # 5

# Backward replay state columns (VMEM scratch): transmittance + the single
# combined cotangent-weighted prefix sum (see the q-collapse in the kernel)
S_T, S_BQ = range(2)
STATE_COLS = 8


def _upper_tri(chunk: int) -> jnp.ndarray:
    """(chunk, chunk) upper-triangular ones: x @ tri = inclusive row cumsum.

    Prefix sums as an MXU contraction — one (pix, chunk) @ (chunk, chunk)
    matmul replaces log2(chunk) VPU shift-add passes.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (row <= col).astype(jnp.float32)


def _dot_tri(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """x @ tri at ~f32 accuracy in TWO default-precision MXU passes.

    ``tri`` is 0/1 (exactly bf16-representable), so only ``x`` needs the
    hi+err bf16 split: x@tri = x_hi@tri + (x-x_hi)@tri with f32 accumulation.
    3x cheaper than Precision.HIGHEST's six passes; residual error ~2^-17.
    """
    x_hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    x_err = x - x_hi
    hi = jnp.dot(x_hi, tri, preferred_element_type=jnp.float32)
    err = jnp.dot(x_err, tri, preferred_element_type=jnp.float32)
    return hi + err


def _cumsum_lanes(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Inclusive lane cumsum of (pix, chunk) via BLOCKED tri matmuls.

    tri is (128, 128); chunk must be a multiple of 128.  The naive
    (pix, chunk) @ (chunk, chunk) contraction scales quadratically in the
    chunk — at chunk=256 it doubles the MXU MACs per slot, which is exactly
    what made the 256-lane backward LOSE in the round-3 sweep.  Blocking
    keeps the MXU work linear: per 128-block one tri contraction plus a
    broadcast add of the running block total (f32-exact adds; the ~2^-17
    _dot_tri residual is unchanged)."""
    b = tri.shape[0]
    n = x.shape[-1]
    if n == b:
        return _dot_tri(x, tri)
    assert n % b == 0
    out = []
    carry = None
    for k in range(n // b):
        xb = x[:, k * b : (k + 1) * b]
        c = _dot_tri(xb, tri)
        if carry is not None:
            c = c + carry
        # Running carry via a PLAIN block sum (cheaper than extracting the
        # cumsum's last lane: no iota/where).  Rounds differently from the
        # in-block matmul prefix by ~1 ulp, which can flip before_bad only
        # for an INELIGIBLE lane exactly at a block boundary at the T_EPS
        # knife edge — such a lane contributes zero either way.
        s = jnp.sum(xb, axis=1, keepdims=True)
        carry = s if carry is None else carry + s
        out.append(c)
    return jnp.concatenate(out, axis=1)


def _dot3(a: jnp.ndarray, b: jnp.ndarray, dims) -> jnp.ndarray:
    """dot_general at ~f32 accuracy in THREE default-precision MXU passes.

    Both operands get the bf16 hi+err split; the err*err term (~2^-18) is
    dropped — half of Precision.HIGHEST's six passes for the same practical
    accuracy (bfloat16x3 scheme).
    """
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_err = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_err = b - b_hi
    d = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    return d(a_hi, b_hi) + d(a_hi, b_err) + d(a_err, b_hi)


def _tile_pixel_coords(tile_id, grid_x: int, tile_w: int, tile_h: int):
    """Float pixel coordinates of this tile's pixels, shape (PIX, 1)."""
    pix = tile_w * tile_h
    ty = tile_id // grid_x
    tx = tile_id % grid_x
    idx = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = (tx * tile_w + idx % tile_w).astype(jnp.float32)
    py = (ty * tile_h + idx // tile_w).astype(jnp.float32)
    return px, py


def _tile_feature_matrix(px, py, ox, oy, pix):
    """(pix, 8) pixel-feature matrix [1, pxl, pyl, pxl^2, pxl*pyl, pyl^2, 0, 0]
    in TILE-CENTER-relative coordinates (ox/oy are the tile center).

    Every entry is a small half-integer product (|pxl| <= 7.5, |pxl*pyl| <=
    56.25, representable in <= 8 mantissa bits) — EXACTLY bf16, so the power
    matmul (see _chunk_alpha) only needs the instance-side operand split.
    This is the backward's moment matrix (Pmat) and the alpha evaluator's
    feature matrix in one.
    """
    pxl = px - ox
    pyl = py - oy
    ones_col = jnp.ones((pix, 1), jnp.float32)
    return jnp.concatenate(
        [ones_col, pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl,
         jnp.zeros((pix, 2), jnp.float32)],
        axis=1,
    )


def _chunk_alpha(meta, Fmat, ox, oy, n_in_chunk, chunk, *, lo=0,
                 want_grad_terms=False):
    """Per-(pixel, instance) alpha for one chunk.

    meta: (NUM_FIELDS, chunk) VMEM slab; Fmat: the (pix, 8) pixel-feature
    matrix from _tile_feature_matrix; ox/oy: the tile-center coordinates it
    was built with.  Returns (alpha_eff, eligible, not_capped, G); alpha_eff
    is zero where not eligible.  Skip semantics match forward.cu:462-476.

    The quadratic form rides the MXU (round 5): power(p, i) is bilinear in
    per-pixel features [1, pxl, pyl, pxl^2, pxl*pyl, pyl^2] and per-instance
    coefficients, so ONE (pix, 8) @ (8, chunk) contraction replaces the
    ~7 per-(pixel, instance) VPU passes of the dx/dy FMA chain.  Exactness:
    Fmat entries are exactly bf16 (see _tile_feature_matrix); the instance
    rows get a 3-way bf16 split (24 mantissa bits, exact).  Tile-CENTER
    centering bounds |g0| <= ~150 even for minimum-size (dilation-floor)
    Gaussians, so the f32 MXU accumulation error on power is ~1e-5 —
    far inside the 2e-4 image parity budget.

    ``lo`` masks HEAD lanes (compact-stream reads start at the 128-aligned
    window below the tile's first instance; lanes < lo belong to the
    previous tile): their opacity row is zeroed, so alpha < ALPHA_MIN and
    they contribute an exact 0 to every downstream sum.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    in_range = (lane >= lo) & (lane < n_in_chunk)  # (1, chunk)

    xl = meta[F_X, :][None, :] - ox  # (1, chunk) tile-center-relative
    yl = meta[F_Y, :][None, :] - oy
    A = -0.5 * meta[F_CA, :][None, :]
    B = -meta[F_CB, :][None, :]
    C = -0.5 * meta[F_CC, :][None, :]
    # Range masking rides the OPACITY ROW (a (1, chunk) where instead of a
    # (pix, chunk) AND in the eligibility mask): op == 0 forces
    # alpha < ALPHA_MIN, and any NaN from out-of-range meta (0*inf, or
    # uninitialized slots past the valid stream) fails every compare below,
    # so the final wheres still see exact zeros.
    op = jnp.where(in_range, meta[F_OP, :][None, :], 0.0)

    # power(p, i) = A dx^2 + B dx dy + C dy^2 with dx = xl - pxl:
    #   = g0 + pxl*g1 + pyl*g2 + pxl^2*A + pxl*pyl*B + pyl^2*C
    g0 = (A * xl + B * yl) * xl + (C * yl) * yl
    g1 = -(2.0 * A * xl + B * yl)
    g2 = -(B * xl + 2.0 * C * yl)
    Ginst = jnp.concatenate(
        [g0, g1, g2, A, B, C, jnp.zeros((2, chunk), jnp.float32)], axis=0
    )  # (8, chunk)
    hi = Ginst.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = Ginst - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo_ = r1 - mid
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    power = d(Fmat, hi) + d(Fmat, mid) + d(Fmat, lo_)  # (pix, chunk)

    G = jnp.exp(power)
    raw = op * G
    alpha = jnp.minimum(ALPHA_CAP, raw)
    # power <= 0 exactly in real arithmetic (PSD conic); the matmul rounds
    # by ~1e-5 either way, and a spurious positive at a Gaussian's CENTER
    # pixel would drop its largest alpha.  POWER_EPS >> rounding keeps those
    # (alpha error <= op * 1e-4) while still rejecting genuinely positive
    # powers from degenerate conics (whose exp/inf the where() kills).
    eligible = (power <= POWER_EPS) & (alpha >= ALPHA_MIN)
    alpha_eff = jnp.where(eligible, alpha, 0.0)
    if not want_grad_terms:
        return alpha_eff, eligible, None, None
    not_capped = raw < ALPHA_CAP
    return alpha_eff, eligible, not_capped, G


def _col(state: jnp.ndarray, i: int) -> jnp.ndarray:
    """Column i of a (pix, COLS) state block as (pix, 1)."""
    return state[:, i : i + 1]


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def _forward_kernel(
    starts_ref,  # (num_tiles_padded,) int32, scalar-prefetched into SMEM
    ends_ref,  # (num_tiles_padded,) int32
    meta_hbm,  # (NUM_FIELDS, cap_padded) HBM
    out_ref,  # (T_PER, PIX, OUT_COLS) VMEM — doubles as accumulator state
    meta_vmem,  # (2, NUM_FIELDS, chunk) VMEM scratch
    sems,  # (2,) DMA semaphores
    *,
    grid_x: int,
    num_tiles: int,
    tile_w: int,
    tile_h: int,
    chunk: int,
    t_per: int,
):
    """Processes ``t_per`` tiles per grid step (amortizes the fixed per-tile
    program cost — constants, loop setup, pipeline bookkeeping — which
    dominates for lightly-loaded tiles)."""
    pix = tile_w * tile_h
    tri = _upper_tri(min(chunk, 128))
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (pix, OUT_COLS), 1)

    for t in range(t_per):
        tile_id = pl.program_id(0) * t_per + t

        @pl.when(tile_id < num_tiles)
        def _():
            _forward_one_tile(
                tile_id, t, starts_ref, ends_ref, meta_hbm, out_ref,
                meta_vmem, sems, tri, lane8,
                grid_x=grid_x, tile_w=tile_w, tile_h=tile_h, chunk=chunk,
            )


def _forward_one_tile(
    tile_id, t, starts_ref, ends_ref, meta_hbm, out_ref, meta_vmem, sems,
    tri, lane8, *, grid_x, tile_w, tile_h, chunk,
):
    pix = tile_w * tile_h
    # COMPACT reads (round 4): tile ranges are arbitrary positions in the
    # sorted stream; DMA from the chunk-aligned window below the start and
    # mask the head lanes (the hint lets Mosaic prove the DMA lane offsets
    # are 128-divisible).  This removed the aligned-relayout kernel + its
    # chunk-map glue (~10 ms/iter at bench scale) for ~zero extra chunks.
    start = starts_ref[tile_id]
    end = ends_ref[tile_id]
    # Window base at 128 (the DMA alignment unit), NOT at ``chunk``: with
    # chunk=256 this halves the expected head (E[head] 128 -> 64), i.e.
    # ~0.25 fewer chunks per tile, and 128-aligned offsets are all Mosaic
    # requires for the (16, chunk) window copies.
    w0 = pl.multiple_of((start // 128) * 128, 128)
    head = start - w0
    nchunks = jnp.where(end > start, pl.cdiv(end - w0, chunk), 0)

    px, py = _tile_pixel_coords(tile_id, grid_x, tile_w, tile_h)
    # tile-CENTER origin: bounds the power matmul's per-instance coefficient
    # magnitudes (see _chunk_alpha precision note)
    ox = ((tile_id % grid_x) * tile_w).astype(jnp.float32) + 0.5 * (tile_w - 1)
    oy = ((tile_id // grid_x) * tile_h).astype(jnp.float32) + 0.5 * (tile_h - 1)
    Fmat = _tile_feature_matrix(px, py, ox, oy, pix)

    # init state: T=1, NB=BIG (no early-stop yet), everything else 0
    out_ref[t] = jnp.where(
        lane8 == O_T, 1.0, jnp.where(lane8 == O_NB, NB_BIG, 0.0)
    )

    def chunk_dma(slot, c):
        return pltpu.make_async_copy(
            meta_hbm.at[:, pl.ds(w0 + c * chunk, chunk)],
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

        st = out_ref[t]  # (pix, OUT_COLS)
        T = _col(st, O_T)
        NB = _col(st, O_NB)
        done = NB < NB_BIG

        n_in_chunk = end - w0 - c * chunk
        alpha, _elig, _ncap, _G = _chunk_alpha(
            meta, Fmat, ox, oy, n_in_chunk, chunk, lo=head - c * chunk
        )

        om = 1.0 - alpha
        # Transmittance via exp of an MXU prefix-sum of logs (round 3): the
        # 14-pass Hillis-Steele chain this replaces was the single biggest
        # VPU cost in the kernel.  om == 1.0 exactly on non-contributing
        # lanes (log -> exact 0), contributing alphas are capped at 0.99 so
        # log(om) is finite, and the ~1e-7 relative rounding of the log/exp
        # round-trip is far below the 2e-4 image parity budget (the backward
        # replay has always used this formulation, so fwd/bwd stay
        # consistent).  Early-stop decisions use the same values, so they
        # are self-consistent; vs the oracle they can flip only inside a
        # ~1e-6-relative window around T_EPS.
        lw = jnp.log(om)
        cum_log = _cumsum_lanes(lw, tri)  # inclusive cumsum of logs
        E = jnp.exp(cum_log - lw)  # exclusive cumprod of (1-a_j)
        T_before = T * E
        test_T = T_before * om

        # Early-stop via MONOTONICITY (round 3): test_T is non-increasing
        # along lanes (each eligible lane multiplies by om <= 1 - 1/255;
        # non-eligible lanes add an exact 0 to cum_log, so their test_T is
        # bitwise the previous value), so "strictly before the first bad
        # lane" is simply test_T >= T_EPS.  Exactness: for eligible lanes
        # the equivalence is definitional; a lane after the first bad lane
        # can never pass the test because the 1/255 alpha floor shrinks
        # test_T by >= 0.39% per eligible lane while the 2-pass _dot_tri
        # rounding wiggle is ~3.5e-5 relative — two orders of magnitude
        # smaller.  This replaces the bad-flag MXU cumsum + one-hot E-at-bad
        # select + any() + last-lane extraction of rounds 1-2 with one
        # compare and two lane-min reductions.
        # alpha is already exactly 0 on ineligible lanes, so the contributor
        # weight needs no eligibility AND (one fewer (pix, chunk) pass)
        before_bad = test_T >= T_EPS
        contrib = before_bad & (~done)
        w = jnp.where(contrib, alpha * T_before, 0.0)

        # one MXU contraction computes all four weighted accumulations:
        # (pix, chunk) x (4, chunk) contracted over the instance lanes
        acc = _dot3(
            w, meta[F_R : F_INVD + 1, :], (((1,), (1,)), ((), ()))
        )  # (pix, 4)
        dCr = acc[:, 0:1]
        dCg = acc[:, 1:2]
        dCb = acc[:, 2:3]
        dinvd = acc[:, 3:4]

        # T after this chunk = the smallest surviving test_T (== T * E[k*]
        # at the first bad lane k*, or the full product with no bad lane —
        # the min over passing lanes IS that value by monotonicity).
        # min(T, .) covers the k* == 0 case (every lane bad -> T unchanged).
        m_ok = jnp.min(
            jnp.where(before_bad, test_T, BIG_T), axis=1, keepdims=True
        )
        T_new = jnp.where(done, T, jnp.minimum(T, m_ok))

        # first-bad STREAM position: before_bad is a prefix property (test_T
        # is monotone along lanes), so the count of passing lanes IS the
        # first-bad lane index — one sum reduction replaces the round-3
        # m_all min + last-contributor pos/max tracking.  k == chunk means
        # no bad lane in this chunk.
        k_star = jnp.sum(
            before_bad.astype(jnp.float32), axis=1, keepdims=True
        )
        base = (w0 + c * chunk).astype(jnp.float32)
        first_bad = jnp.where(k_star < float(chunk), base + k_star, NB_BIG)
        NB_new = jnp.minimum(NB, first_bad)

        new_st = jnp.concatenate(
            [
                _col(st, O_R) + dCr,
                _col(st, O_G) + dCg,
                _col(st, O_B) + dCb,
                T_new,
                _col(st, O_INVD) + dinvd,
                NB_new,
                jnp.zeros((pix, 2), jnp.float32),
            ],
            axis=1,
        )
        out_ref[t] = new_st
        alldone = jnp.sum(
            jnp.where(NB_new < NB_BIG, 1.0, 0.0)
        ) >= float(pix)
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
    meta: jnp.ndarray,  # (NUM_FIELDS, cap_int) sorted COMPACT instance records
    tile_starts: jnp.ndarray,  # (num_tiles,) compact (gapless) starts
    tile_ends: jnp.ndarray,  # (num_tiles,) — start + true count
    *,
    grid_x: int,
    grid_y: int,
    tile_w: int = 16,
    tile_h: int = 16,
    chunk: int = 128,
    interpret: bool = False,
    t_per: int = 16,
) -> jnp.ndarray:
    """Run the forward blend. Returns packed (num_tiles, PIX, OUT_COLS)."""
    num_tiles = grid_x * grid_y
    pix = tile_w * tile_h
    nprog = -(-num_tiles // t_per)
    pad = nprog * t_per - num_tiles
    starts = jnp.pad(tile_starts.astype(jnp.int32), (0, pad))
    # Clamp so the last chunk's window DMA stays inside meta; binds only on
    # overflow steps (whose output is discarded/retried by callers).
    ends = jnp.minimum(tile_ends.astype(jnp.int32), meta.shape[1] - chunk)
    ends = jnp.pad(ends, (0, pad))
    kernel = functools.partial(
        _forward_kernel, grid_x=grid_x, num_tiles=num_tiles, tile_w=tile_w,
        tile_h=tile_h, chunk=chunk, t_per=t_per,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((t_per, pix, OUT_COLS), lambda i, s_, e_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FIELDS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nprog * t_per, pix, OUT_COLS), jnp.float32),
        interpret=interpret,
    )(starts, ends, meta)
    return out[:num_tiles]


# --------------------------------------------------------------------------
# Backward
# --------------------------------------------------------------------------


def _bwd_chunk_math(
    meta, c, n_in_chunk, T, Bq, ox, oy, Pmat, tri,
    Ctot_q, ctmat, n_contrib, chunk, pix, head=0,
):
    """Per-chunk backward-replay math shared by the aligned- and compact-
    output kernels.  Returns (gblock (16, chunk), T_new, Bq_new).

    ``Pmat`` is the tile's (pix, 8) pixel-feature matrix
    (_tile_feature_matrix, tile-CENTER-relative): it is both the moment
    matrix of the gradient reductions and the alpha evaluator's feature
    matrix (``ox``/``oy`` are the center coordinates it was built with).

    ``Ctot_q`` arrives PRE-FOLDED with the final-transmittance cotangent
    term (Ctot_q + T_final*ct_T, per tile) — the /(1-a_k) denominators of
    the suffix and T_final terms are identical (backward.cu:556-590), so
    folding removes two (pix, chunk) passes from every chunk.  ``ctmat`` is
    the per-tile (pix, 4) cotangent block [dC_r|dC_g|dC_b|dinvd].
    """
    alpha, eligible, not_capped, G = _chunk_alpha(
        meta, Pmat, ox, oy, n_in_chunk, chunk, lo=head - c * chunk,
        want_grad_terms=True,
    )

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    # 0-based tile-relative position, (1, chunk) — broadcast against the
    # (pix, 1) per-pixel contributor bound (head lanes go negative but are
    # never eligible, so they cannot enter contrib)
    pos = (c * chunk + lane - head).astype(jnp.float32)
    contrib = eligible & (pos < n_contrib)
    a = jnp.where(contrib, alpha, 0.0)

    om = 1.0 - a
    # exclusive cumprod via exp(cumsum(log)) — the cumsum rides the MXU
    # (x @ upper-triangular-ones == inclusive row cumsum); exclusive =
    # inclusive minus self.  om == 1 exactly for non-contributing lanes
    # (log 0), and contributing alphas are capped at 0.99 so log(om) is
    # finite; the ~1e-7 relative rounding is far below grad tolerances.
    lw = jnp.log(om)
    cum_log = _cumsum_lanes(lw, tri)
    E = jnp.exp(cum_log - lw)
    T_before = T * E  # true transmittance at each contributing instance
    w = a * T_before

    # dC/da_k = c_k T_k - suffix_k/(1-a_k), with the per-channel suffixes
    # collapsed into ONE because the cotangents dC_c are constant per
    # pixel:  sum_c dC_c * suffix_c(k) = suffix of w*q with
    # q = r*dC_r + g*dC_g + b*dC_b + iv*dinvd — a single prefix sum.  q is
    # a (pix,4)@(4,chunk) contraction, so it rides the MXU (round 4:
    # replaces seven (pix, chunk) VPU passes).
    q = _dot3(ctmat, meta[F_R : F_INVD + 1, :], (((1,), (0,)), ((), ())))
    wq = w * q
    cq_in = Bq + _cumsum_lanes(wq, tri)
    inv_om = 1.0 / om

    # gl = G * d(alpha)/d(raw) * op * dL/da written in w-form:
    # op*G*dL_da = q*w*... no — alpha*dL_da = q*w - (alpha/om)*(suffix),
    # and op*G == alpha exactly on uncapped lanes (the only ones that get
    # gradient), so gl = q*w - (a*inv_om)*(Ctot_q - cq_in) there.  The
    # where() both zeroes capped lanes (zero grad through the alpha cap,
    # oracle.py) and kills any NaN ridden in from masked-lane meta.
    gl = jnp.where(
        contrib & not_capped,
        wq - (a * inv_om) * (Ctot_q - cq_in),
        0.0,
    )

    # ALL pixel reductions as two MXU contractions over the pixel axis:
    #   s = Pmat^T @ gl -> per-instance moments [Σgl, Σgl·px, Σgl·py,
    #       Σgl·px², Σgl·px·py, Σgl·py²] from which every conic/mean
    #       gradient follows (per-instance factors pulled out of the sum),
    #   cacc = [dC_r|dC_g|dC_b|dinvd]^T @ w -> the color/invdepth grads.
    # Pmat entries are integers <= 225 — EXACTLY bf16-representable — so
    # only gl needs the hi+err split: two default-precision passes give the
    # same ~2^-17 accuracy as _dot3's three.
    gl_hi = gl.astype(jnp.bfloat16).astype(jnp.float32)
    gl_err = gl - gl_hi
    _dp = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = _dp(Pmat, gl_hi) + _dp(Pmat, gl_err)  # (8, chunk)
    s0 = s[0:1]
    sx = s[1:2]
    sy = s[2:3]
    sxx = s[3:4]
    sxy = s[4:5]
    syy = s[5:6]

    xl = meta[F_X : F_X + 1, :] - ox  # tile-local instance x, (1, chunk)
    yl = meta[F_Y : F_Y + 1, :] - oy
    ca = meta[F_CA : F_CA + 1, :]
    cb = meta[F_CB : F_CB + 1, :]
    cc = meta[F_CC : F_CC + 1, :]
    # Σ gl·dx = xl·Σgl − Σgl·px, etc. (dx = xl − pxl)
    gdx = xl * s0 - sx
    gdy = yl * s0 - sy
    gdxx = xl * xl * s0 - 2.0 * xl * sx + sxx
    gdxy = xl * yl * s0 - xl * sy - yl * sx + sxy
    gdyy = yl * yl * s0 - 2.0 * yl * sy + syy

    dL_dx = -(ca * gdx + cb * gdy)
    dL_dy = -(cc * gdy + cb * gdx)
    dL_dca = -0.5 * gdxx
    dL_dcb = -gdxy
    dL_dcc = -0.5 * gdyy
    # dL/dop = Σ_pix G·dL_da = Σgl / op (op = 0 lanes are ineligible -> 0)
    op_row = meta[F_OP : F_OP + 1, :]
    dL_dop = s0 * jnp.where(op_row > 0.0, 1.0 / jnp.maximum(op_row, 1e-30), 0.0)

    cacc = _dot3(ctmat, w, (((0,), (0,)), ((), ())))  # (4, chunk)
    dL_dr = cacc[0:1]
    dL_dg = cacc[1:2]
    dL_db = cacc[2:3]
    dL_div = cacc[3:4]

    zrow = jnp.zeros_like(dL_dx)
    gblock = jnp.concatenate(
        [
            dL_dx, dL_dy, dL_dca, dL_dcb, dL_dcc, dL_dop,
            dL_dr, dL_dg, dL_db, dL_div,
            zrow, zrow, zrow, zrow, zrow, zrow,
        ],
        axis=0,
    )
    # Per-pixel carries via PLAIN lane sums (round 5): lw == 0 exactly on
    # non-contributing lanes so sum(lw) is the log of this chunk's T factor,
    # and Bq accumulates sum(w*q).  A direct tree-sum reduction is cheaper
    # than extracting the cumsum matmul's last lane (no iota/where); the
    # replay T drifts from the forward only in rounding (~1e-7 relative),
    # and the contributor SET stays exact through the NB compare.
    T_new = T * jnp.exp(jnp.sum(lw, axis=1, keepdims=True))
    Bq_new = Bq + jnp.sum(wq, axis=1, keepdims=True)
    return gblock, T_new, Bq_new


# --------------------------------------------------------------------------
# Backward: COMPACT reads AND compact gradient output (round-4 path)
# --------------------------------------------------------------------------
#
# The kernel reads the sorted compact stream directly (chunk-aligned window
# DMAs with head-masked lanes, same as the forward) and streams per-instance
# gradients out COMPACTLY, so the VJP reorders them with a cheap payload
# sort.  Because each chunk's lanes sit exactly on one 128-aligned window of
# the compact stream, gradient blocks land on their output window with NO
# rotation (round 3 rotated by (dest % 128) via a one-hot matmul — compact
# reads made the windows line up by construction).  A rolling two-half
# staging buffer accumulates window adds — adjacent tiles SHARE boundary
# windows, the add makes the seam exact — and flushes a window once the
# stream head passes it.  Sequential grid => no write races; in-flight
# flushes are awaited before their half is touched again.

_SM_CURW, _SM_PEND0, _SM_PEND1, _SM_WIN0, _SM_WIN1 = range(5)


def _backward_kernel_compact(
    starts_ref,  # COMPACT tile starts (scalar prefetch)
    ends_ref,  # compact tile ends (start + true count)
    meta_hbm,
    fwd_ref,
    ct_ref,
    grad_hbm,  # out (NUM_FIELDS, capacity + 2*CHUNK) compact
    state_ref,
    meta_vmem,
    staging,  # (2, NUM_FIELDS, CHUNK) rolling output windows
    in_sems,
    flush_sems,  # (2,)
    sm,  # SMEM (8,) int32 state: cur_w, pend0, pend1, win0, win1
    *,
    grid_x: int,
    num_tiles: int,
    tile_w: int,
    tile_h: int,
    chunk: int,
    t_per: int,
):
    tri = _upper_tri(min(chunk, 128))

    @pl.when(pl.program_id(0) == 0)
    def _():
        staging[...] = jnp.zeros_like(staging)
        sm[_SM_CURW] = 0
        sm[_SM_PEND0] = 0
        sm[_SM_PEND1] = 0

    def flush_copy(h, w):
        return pltpu.make_async_copy(
            staging.at[h],
            grad_hbm.at[:, pl.ds(w * chunk, chunk)],
            flush_sems.at[h],
        )

    for t in range(t_per):
        tile_id = pl.program_id(0) * t_per + t

        @pl.when(tile_id < num_tiles)
        def _():
            _backward_one_tile_compact(
                tile_id, t, starts_ref, ends_ref, meta_hbm,
                fwd_ref, ct_ref, state_ref, meta_vmem, staging, in_sems,
                flush_sems, sm, flush_copy, tri,
                grid_x=grid_x, tile_w=tile_w, tile_h=tile_h, chunk=chunk,
            )

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        # drain: wait outstanding flushes, then write the final partial window
        for h in (0, 1):
            @pl.when(sm[_SM_PEND0 + h] == 1)
            def _():
                flush_copy(h, sm[_SM_WIN0 + h]).wait()
                # pend still set here means NO adds landed on this half since
                # its flush started (the body's add path clears pend before
                # adding) — the half holds the PREVIOUS window's data.  Zero
                # it exactly as the body does, so the final-window flush below
                # writes zeros (correct for a window whose chunks were all
                # early-out skipped) instead of stale gradients.
                staging[h] = jnp.zeros_like(staging[h])
                sm[_SM_PEND0 + h] = 0
        cur_w = sm[_SM_CURW]
        final = flush_copy(jax.lax.rem(cur_w, 2), cur_w)
        final.start()
        final.wait()


def _backward_one_tile_compact(
    tile_id, t, starts_ref, ends_ref, meta_hbm, fwd_ref, ct_ref,
    state_ref, meta_vmem, staging, in_sems, flush_sems, sm, flush_copy, tri,
    *, grid_x, tile_w, tile_h, chunk,
):
    pix = tile_w * tile_h
    start = starts_ref[tile_id]
    end = ends_ref[tile_id]
    w0 = pl.multiple_of((start // chunk) * chunk, chunk)
    head = start - w0

    px, py = _tile_pixel_coords(tile_id, grid_x, tile_w, tile_h)
    # tile-CENTER origin (see _chunk_alpha precision note); Pmat doubles as
    # the moment matrix and the alpha evaluator's pixel-feature matrix
    ox = ((tile_id % grid_x) * tile_w).astype(jnp.float32) + 0.5 * (tile_w - 1)
    oy = ((tile_id // grid_x) * tile_h).astype(jnp.float32) + 0.5 * (tile_h - 1)
    Pmat = _tile_feature_matrix(px, py, ox, oy, pix)

    fwd = fwd_ref[t]
    T_final = _col(fwd, O_T)
    C_tot_r = _col(fwd, O_R)
    C_tot_g = _col(fwd, O_G)
    invd_tot = _col(fwd, O_INVD)
    C_tot_b = _col(fwd, O_B)
    # Tile-relative EXCLUSIVE contributor bound from the first-bad stream
    # position: contrib == eligible & (pos < nb_rel) reproduces the
    # forward's contributor set exactly (before_bad is a prefix property;
    # lanes between the last contributor and the first bad lane are
    # ineligible, so the eligible mask excludes them either way).
    NB = _col(fwd, O_NB)
    n_contrib = jnp.minimum(NB - start.astype(jnp.float32),
                            (end - start).astype(jnp.float32))

    ct = ct_ref[t]
    dC_r = _col(ct, CT_R)
    dC_g = _col(ct, CT_G)
    dC_b = _col(ct, CT_B)
    dinvd = _col(ct, CT_INVD)
    ct_T = _col(ct, CT_BGDOT)
    # T_final*ct_T folded in: its /(1-a_k) denominator matches the suffix's
    ctmat = jnp.concatenate([dC_r, dC_g, dC_b, dinvd], axis=1)  # (pix, 4)
    Ctot_q = (
        C_tot_r * dC_r + C_tot_g * dC_g + C_tot_b * dC_b + invd_tot * dinvd
        + T_final * ct_T
    )

    nchunks = jnp.where(end > start, pl.cdiv(end - w0, chunk), 0)
    # Early-out: instances past the LAST contributor of any pixel (the
    # forward's early-stop, forward.cu:477-482) provably get zero gradients
    # (contrib == False everywhere) — skip their math and let the staging
    # stream flush the zeros it already holds.  n_contrib is tile-relative;
    # +head converts to stream-window chunks.
    max_nc = jnp.max(n_contrib).astype(jnp.int32)
    active_chunks = jnp.minimum(nchunks, pl.cdiv(max_nc + head, chunk))

    lane_s = jax.lax.broadcasted_iota(jnp.int32, (pix, STATE_COLS), 1)
    state_ref[:] = jnp.where(lane_s == S_T, 1.0, 0.0)

    def in_dma(slot, c):
        return pltpu.make_async_copy(
            meta_hbm.at[:, pl.ds(w0 + c * chunk, chunk)],
            meta_vmem.at[slot],
            in_sems.at[slot],
        )

    @pl.when(active_chunks > 0)
    def _():
        in_dma(0, 0).start()

    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def body(c, _):
        n_in_chunk = end - w0 - c * chunk

        @pl.when(c < active_chunks)
        def _():
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < active_chunks)
            def _():
                in_dma(jax.lax.rem(c + 1, 2), c + 1).start()

            in_dma(slot, c).wait()

            st = state_ref[:]
            T = _col(st, S_T)
            Bq = _col(st, S_BQ)

            meta = meta_vmem[slot]
            gblock, T_new, Bq_new = _bwd_chunk_math(
                meta, c, n_in_chunk, T, Bq, ox, oy, Pmat, tri,
                Ctot_q, ctmat, n_contrib, chunk, pix, head=head,
            )
            # head lanes belong to the PREVIOUS tile (it already emitted
            # them); tail lanes past the tile's count belong to the NEXT.
            # Zero both so this tile's staging add is a no-op there.
            gblock = jnp.where(
                (lane_row >= head - c * chunk) & (lane_row < n_in_chunk),
                gblock,
                0.0,
            )

            # This chunk IS stream window (w0//chunk + c): no rotation —
            # add straight into the matching staging half (after any
            # pending flush of that half lands).
            wi = w0 // chunk + c
            h = jax.lax.rem(wi, 2)

            @pl.when(sm[_SM_PEND0 + h] == 1)
            def _():
                flush_copy(h, sm[_SM_WIN0 + h]).wait()
                staging[h] = jnp.zeros_like(staging[h])
                sm[_SM_PEND0 + h] = 0

            staging[h] = staging[h] + gblock

            # partial-lane store: only the 2 live columns change per chunk
            state_ref[:, 0:2] = jnp.concatenate([T_new, Bq_new], axis=1)

        # stream-head/flush bookkeeping runs for EVERY chunk: skipped
        # (early-out) chunks emit the zeros their staging windows already
        # contain.  Clamping to ``end`` keeps the boundary window open for
        # the next tile's head lanes.
        pos_done = jnp.minimum(w0 + (c + 1) * chunk, end)
        cur_w = sm[_SM_CURW]

        @pl.when(pos_done // chunk > cur_w)
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

        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


def blend_backward_compact_pallas(
    meta: jnp.ndarray,  # (NUM_FIELDS, cap_int) sorted COMPACT records
    tile_starts: jnp.ndarray,  # (num_tiles,) compact (gapless) starts
    tile_ends: jnp.ndarray,  # (num_tiles,) start + true count
    fwd_packed: jnp.ndarray,
    ct_packed: jnp.ndarray,
    *,
    capacity: int,
    grid_x: int,
    grid_y: int,
    tile_w: int = 16,
    tile_h: int = 16,
    chunk: int = 128,
    interpret: bool = False,
    t_per: int = 2,
) -> jnp.ndarray:
    """Per-instance gradients in COMPACT sorted order,
    shape (NUM_FIELDS, capacity + 2*chunk).  Slots past the valid stream end
    are undefined; callers mask by compact position < n_valid."""
    num_tiles = grid_x * grid_y
    pix = tile_w * tile_h
    nprog = -(-num_tiles // t_per)
    pad = nprog * t_per - num_tiles
    starts = jnp.pad(tile_starts.astype(jnp.int32), (0, pad))
    # window-DMA tail clamp (binds only on discarded overflow steps)
    ends = jnp.minimum(tile_ends.astype(jnp.int32), meta.shape[1] - chunk)
    ends = jnp.pad(ends, (0, pad))
    fwd_p = jnp.pad(fwd_packed, ((0, pad), (0, 0), (0, 0)))
    ct_p = jnp.pad(ct_packed, ((0, pad), (0, 0), (0, 0)))
    kernel = functools.partial(
        _backward_kernel_compact, grid_x=grid_x, num_tiles=num_tiles,
        tile_w=tile_w, tile_h=tile_h, chunk=chunk, t_per=t_per,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((t_per, pix, OUT_COLS), lambda i, s_, e_: (i, 0, 0)),
            pl.BlockSpec((t_per, pix, CT_COLS), lambda i, s_, e_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((pix, STATE_COLS), jnp.float32),
            pltpu.VMEM((2, NUM_FIELDS, chunk), jnp.float32),
            pltpu.VMEM((2, NUM_FIELDS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((8,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (NUM_FIELDS, capacity + 2 * chunk), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, ends, meta, fwd_p, ct_p)
