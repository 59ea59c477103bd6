"""Instance pipeline v2 (expand kernel + payload sort + aligned relayout)
vs the round-1 binning path: identical per-tile contents and blend records.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu.ops import instances as inst
from gaussian_splatting_tpu.ops.binning import bin_gaussians
from gaussian_splatting_tpu.ops.preprocess import preprocess
from gaussian_splatting_tpu.utils.testing import random_scene


def _diff_fields(proj):
    safe_depth = jnp.where(proj.valid, proj.depths, 1.0)
    return jnp.stack(
        [
            proj.means2d[:, 0], proj.means2d[:, 1],
            proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2],
            proj.opacities,
            proj.colors[:, 0], proj.colors[:, 1], proj.colors[:, 2],
            1.0 / safe_depth,
        ],
        axis=0,
    )


@pytest.mark.parametrize("seed,n", [(0, 300), (3, 57), (7, 1000)])
def test_pipeline_matches_round1_binning(seed, n):
    w, h = 96, 64
    tile_w = tile_h = 16
    grid_x, grid_y = w // tile_w, h // tile_h
    scene = random_scene(n, sh_degree=1, width=w, height=h, seed=seed,
                         spread=1.6, scale_range=(0.01, 0.12))
    proj = preprocess(
        scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh,
        scene.cam, sh_degree=1, tile_w=tile_w, tile_h=tile_h,
    )
    capacity = inst.required_capacity(n, 12.0)

    layout = inst.build_instances(
        proj, _diff_fields(proj),
        grid_x=grid_x, grid_y=grid_y, capacity=capacity,
        tile_w=tile_w, tile_h=tile_h, interpret=True,
    )
    old = bin_gaussians(
        proj, grid_x=grid_x, grid_y=grid_y, capacity=capacity,
        chunk=128, tile_w=tile_w, tile_h=tile_h,
    )

    assert not bool(layout.overflow)
    n_untouched = int((np.asarray(proj.tiles_touched) == 0).sum())
    assert int(layout.num_instances) == int(old.num_instances) + n_untouched

    starts_n = np.asarray(layout.tile_starts)
    ends_n = np.asarray(layout.tile_ends)
    old_starts = np.asarray(old.tile_starts)
    old_ends = np.asarray(old.tile_ends)
    np.testing.assert_array_equal(ends_n - starts_n, old_ends - old_starts)

    # per-tile record parity: the old path gathers ids then fields; the new
    # path carries fields through the sort.  Compare the (mx,my,...) rows.
    meta_new = np.asarray(layout.meta_sorted)
    fields = np.asarray(_diff_fields(proj))  # (10, P)
    ids_old = np.asarray(old.gaussian_ids)
    for t in range(grid_x * grid_y):
        s, e = starts_n[t], ends_n[t]
        got = meta_new[:10, s:e]
        ref_ids = ids_old[old_starts[t]:old_ends[t]]
        want = fields[:, ref_ids]
        np.testing.assert_allclose(got, want, rtol=0, atol=0, err_msg=f"tile {t}")


def test_expansion_segment_bookkeeping():
    n = 120
    w, h = 64, 48
    scene = random_scene(n, sh_degree=0, width=w, height=h, seed=5)
    proj = preprocess(
        scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh,
        scene.cam, sh_degree=0, tile_w=16, tile_h=16,
    )
    capacity = inst.required_capacity(n, 12.0)
    layout = inst.build_instances(
        proj, _diff_fields(proj),
        grid_x=4, grid_y=3, capacity=capacity, tile_w=16, tile_h=16,
        interpret=True,
    )
    counts = np.where(np.asarray(proj.tiles_touched) > 0,
                      np.asarray(proj.tiles_touched), 1)
    incl = np.cumsum(counts)
    np.testing.assert_array_equal(np.asarray(layout.seg_ends), incl)
    # flags mark exactly one segment start per Gaussian (incl. sentinels)
    flags = np.asarray(layout.flags_exp)
    n_segs_in_cap = int((incl - counts < capacity).sum())
    assert flags.sum() >= n_segs_in_cap  # terminator tail may add segments
    # the sort permutation is a bijection over the internal pipeline slots
    # (capacity rounded up to the expand grid granularity + align slack)
    src_arr = np.asarray(layout.sorted_src)
    cap_int = src_arr.shape[0]
    assert cap_int >= capacity
    assert sorted(src_arr.tolist()) == list(range(cap_int))


def test_overflow_flag():
    n = 200
    scene = random_scene(n, sh_degree=0, width=64, height=64, seed=2,
                         scale_range=(0.05, 0.3))
    proj = preprocess(
        scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh,
        scene.cam, sh_degree=0, tile_w=16, tile_h=16,
    )
    layout = inst.build_instances(
        proj, _diff_fields(proj),
        grid_x=4, grid_y=4, capacity=256, tile_w=16, tile_h=16,
        interpret=True,
    )
    assert bool(layout.overflow)


def test_grads_finite_with_sentinels_and_culled_instances():
    """Regression (round 2): expansion slots of sentinel instances and
    circle-culled instances map past the written gradient region; masking
    them with multiply leaked NaN (uninitialized HBM) into real gradients."""
    from gaussian_splatting_tpu.ops.rasterize import render

    scene = random_scene(400, sh_degree=2, width=128, height=96, seed=7,
                         bg=(0.05, 0.05, 0.2))
    op = jnp.clip(scene.opacities * 0.5, 0, 1)

    def loss(op, impl):
        o = render(scene.means3d, scene.scales, scene.quats, op, scene.sh,
                   scene.cam, scene.bg, sh_degree=2, impl=impl)
        return jnp.sum(o.image) * 1e-3

    gd = jax.grad(loss)(op, "dense")
    gp = jax.grad(loss)(op, "pallas")
    assert int(jnp.isnan(gp).sum()) == 0
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd), atol=3e-4)


def test_ellipse_spans_cover_all_eligible_pixels():
    """Exact-cull contract (round 5, ellipse spans): every tile containing a
    pixel the blend's own eligibility test accepts (alpha >= 1/255, i.e.
    Q(d) <= tau) AND inside the r_cut circle (the 3-sigma rect clamp the
    pipeline has applied since round 3) must appear in the span set.
    Brute force over all pixels."""
    from gaussian_splatting_tpu.ops.preprocess import compute_tile_spans

    w, h = 128, 96
    tw = th = 16
    gx, gy = w // tw, h // th
    scene = random_scene(600, sh_degree=0, width=w, height=h, seed=11,
                         spread=1.4, scale_range=(0.003, 0.25))
    proj = preprocess(
        scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh,
        scene.cam, sh_degree=0, tile_w=tw, tile_h=th,
    )
    valid = np.asarray(proj.valid)
    cx = np.asarray(proj.means2d[:, 0]).astype(np.float64)
    cy = np.asarray(proj.means2d[:, 1]).astype(np.float64)
    a = np.asarray(proj.conics[:, 0]).astype(np.float64)
    b = np.asarray(proj.conics[:, 1]).astype(np.float64)
    c = np.asarray(proj.conics[:, 2]).astype(np.float64)
    op = np.asarray(proj.opacities).astype(np.float64)
    tau = 2.0 * np.log(np.maximum(255.0 * op, 1.0))
    span_x0 = np.asarray(proj.span_x0).astype(np.int64)
    span_cum = np.asarray(proj.span_cum).astype(np.int64)
    span_flag = np.asarray(proj.span_flag)
    r_cut = np.asarray(proj.cut_radius).astype(np.float64)
    ry0 = np.asarray(proj.rect_min[:, 1])
    rx0 = np.asarray(proj.rect_min[:, 0])
    rx1 = np.asarray(proj.rect_max[:, 0])
    ry1 = np.asarray(proj.rect_max[:, 1])

    px = np.arange(w, dtype=np.float64)
    py = np.arange(h, dtype=np.float64)
    PX, PY = np.meshgrid(px, py)  # (h, w)

    checked = 0
    for g in np.nonzero(valid & span_flag)[0][:200]:
        dx = PX - cx[g]
        dy = PY - cy[g]
        Q = a[g] * dx * dx + 2.0 * b[g] * dx * dy + c[g] * dy * dy
        rc = r_cut[g]
        elig = (Q <= tau[g]) & (dx * dx + dy * dy <= rc * rc)
        # tiles containing an eligible pixel
        tile_has = np.zeros((gy, gx), bool)
        ys, xs = np.nonzero(elig)
        tile_has[ys // th, xs // tw] = True
        # tiles in the span set
        in_span = np.zeros((gy, gx), bool)
        prev = 0
        for r in range(16):
            ty = ry0[g] + r
            cnt = span_cum[g, r] - prev
            prev = span_cum[g, r]
            if cnt <= 0 or ty < 0 or ty >= gy:
                continue
            x0 = span_x0[g, r]
            in_span[ty, x0 : x0 + cnt] = True
        missing = tile_has & ~in_span
        assert not missing.any(), (
            f"gaussian {g}: eligible pixels outside the span set at tiles "
            f"{np.argwhere(missing)[:4]}"
        )
        checked += 1
    assert checked >= 50  # the scene must actually exercise the span path
