"""Estimate instance-count reduction from ellipse-exact (vs circle) spans.

Computes, on the bench scene at bench shape, the exact per-row tile spans
under (a) the current opacity-aware CIRCLE predicate and (b) the conic
ELLIPSE predicate {Q(d) <= tau}, tau = 2 ln(255 op) — the true alpha >=
1/255 eligibility set.  Pure numpy on the preprocess outputs; no kernels.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

from gaussian_splatting_tpu.ops.preprocess import preprocess
from gaussian_splatting_tpu.utils.testing import random_scene

W, H = 1920, 1080
TW = TH = 16
scene = random_scene(
    500_000, sh_degree=3, width=W, height=H, seed=0, spread=2.0,
    scale_range=(0.0025, 0.012), cam_distance=4.0,
)
proj = jax.jit(
    lambda m, s, q, o, sh_: preprocess(m, s, q, o, sh_, scene.cam, sh_degree=3)
)(scene.means3d, scene.scales, scene.quats, scene.opacities, scene.sh)

valid = np.asarray(proj.valid)
tiles_now = np.asarray(proj.tiles_touched)
print("current exact-circle instances:", tiles_now.sum())

cx = np.asarray(proj.means2d[:, 0])
cy = np.asarray(proj.means2d[:, 1])
a = np.asarray(proj.conics[:, 0]).astype(np.float64)
b = np.asarray(proj.conics[:, 1]).astype(np.float64)
c = np.asarray(proj.conics[:, 2]).astype(np.float64)
op = np.asarray(proj.opacities)
tau = 2.0 * np.log(np.maximum(255.0 * op, 1.0))
detc = a * c - b * b
ok = valid & (detc > 0) & (a > 0) & (c > 0)

# per-axis extents
ex = np.sqrt(np.maximum(tau * c / detc, 0.0))
ey = np.sqrt(np.maximum(tau * a / detc, 0.0))
gx, gy = (W + TW - 1) // TW, (H + TH - 1) // TH
rx0 = np.clip(((cx - ex) // TW).astype(np.int64), 0, gx)
ry0 = np.clip(((cy - ey) // TH).astype(np.int64), 0, gy)
rx1 = np.clip(np.floor((cx + ex + TW) / TW).astype(np.int64), 0, gx)
ry1 = np.clip(np.floor((cy + ey + TH) / TH).astype(np.int64), 0, gy)

dy_lim = np.sqrt(np.maximum(tau * a / detc, 0.0))
dy_star_max = -b * np.sqrt(np.maximum(tau / np.maximum(c * detc, 1e-30), 0.0))

total = np.zeros(len(cx), np.int64)
rect_h = ry1 - ry0
nrows = int(rect_h[ok].max()) if ok.any() else 0
print("max rect rows (ellipse):", nrows, " circle rect_h max:",
      int((np.asarray(proj.rect_max[:, 1]) - np.asarray(proj.rect_min[:, 1]))[valid].max()))
for r in range(min(nrows, 64)):
    ty = ry0 + r
    row_on = ok & (r < rect_h)
    l = ty * TH - cy
    u = ty * TH + (TH - 1) - cy
    lo_d = np.maximum(l, -dy_lim)
    hi_d = np.minimum(u, dy_lim)
    nonempty = row_on & (lo_d <= hi_d)
    dyc = np.clip(dy_star_max, lo_d, hi_d)
    D = np.maximum(tau * a - detc * dyc * dyc, 0.0)
    xmax = (-b * dyc + np.sqrt(D)) / a
    dyc2 = np.clip(-dy_star_max, lo_d, hi_d)
    D2 = np.maximum(tau * a - detc * dyc2 * dyc2, 0.0)
    xmin = (-b * dyc2 - np.sqrt(D2)) / a
    lo_t = np.ceil((cx + xmin - (TW - 1)) / TW).astype(np.int64)
    hi_t = np.floor((cx + xmax) / TW).astype(np.int64)
    lo_t = np.maximum(lo_t, 0)
    hi_t = np.minimum(hi_t, gx - 1)
    span = np.where(nonempty, np.maximum(hi_t - lo_t + 1, 0), 0)
    total += span

total = np.where(ok, np.maximum(total, 0), tiles_now)
print("ellipse-exact instances:", total.sum())
print("ratio:", total.sum() / max(tiles_now.sum(), 1))
# how many gaussians have rect_h > 16 under ellipse (span fallback rate)
print("rect_h>16 count (ellipse):", int(((rect_h > 16) & ok).sum()),
      " (circle):", int((((np.asarray(proj.rect_max[:, 1]) - np.asarray(proj.rect_min[:, 1])) > 16) & valid).sum()))
