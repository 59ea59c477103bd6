"""Generate a synthetic Blender-format dataset by rendering a random
Gaussian scene from multiple viewpoints.

Used by tests, benchmarks and smoke-training runs: the resulting directory
(transforms_train/test.json + PNGs) feeds the normal data pipeline, so the
whole train->render->metrics stack can run end-to-end without external
datasets (none ship in this image).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

from gaussian_splatting_tpu.ops.camera_math import look_at, make_camera
from gaussian_splatting_tpu.ops.rasterize import render
from gaussian_splatting_tpu.utils.testing import random_scene


def _orbit_pose(theta: float, phi: float, radius: float):
    eye = np.array(
        [
            radius * math.cos(phi) * math.sin(theta),
            radius * math.sin(phi),
            -radius * math.cos(phi) * math.cos(theta),
        ]
    )
    return look_at(eye, np.zeros(3)), eye


def generate_blender_dataset(
    out_dir: str,
    *,
    num_train: int = 12,
    num_test: int = 4,
    width: int = 128,
    height: int = 128,
    num_gaussians: int = 600,
    fovx: float = 0.9,
    radius: float = 4.0,
    seed: int = 0,
) -> str:
    import imageio.v2 as imageio
    import jax.numpy as jnp

    scene = random_scene(
        num_gaussians, sh_degree=1, width=width, height=height, seed=seed
    )
    os.makedirs(os.path.join(out_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "test"), exist_ok=True)

    def render_pose(theta, phi):
        (R, t), eye = _orbit_pose(theta, phi, radius)
        cam = make_camera(R, t, fovx=fovx, fovy=fovx, width=width, height=height)
        out = render(
            scene.means3d,
            scene.scales,
            scene.quats,
            scene.opacities,
            scene.sh,
            cam,
            jnp.zeros(3),
            sh_degree=1,
            impl="pallas",
        )
        img = np.asarray(out.image).transpose(1, 2, 0)
        # camera-to-world in OpenGL convention for transforms.json
        Rt = np.zeros((4, 4))
        Rt[:3, :3] = R.T
        Rt[:3, 3] = t
        Rt[3, 3] = 1.0
        c2w = np.linalg.inv(Rt)
        c2w[:3, 1:3] *= -1  # COLMAP -> OpenGL
        return img, c2w

    rng = np.random.default_rng(seed + 1)
    for split, count in (("train", num_train), ("test", num_test)):
        frames = []
        for i in range(count):
            theta = 2 * math.pi * (i / count) + (0.3 if split == "test" else 0.0)
            phi = float(rng.uniform(-0.5, 0.5))
            img, c2w = render_pose(theta, phi)
            rel = f"./{split}/r_{i}"
            imageio.imwrite(
                os.path.join(out_dir, f"{split}/r_{i}.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8),
            )
            frames.append(
                {"file_path": rel, "transform_matrix": c2w.tolist()}
            )
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)
    return out_dir


# --------------------------------------------------------------------------
# Analytic ground truth: a numpy raytracer (NO Gaussians anywhere).
#
# The Gaussian-soup generator above grades the renderer with its own output
# (any renderer bias cancels), and its GT has no surfaces, so novel views
# generalize poorly by construction (round-2 quality run: train 26 dB /
# held-out 17.6).  This scene is textured opaque geometry lit analytically —
# the same regime as the reference's Blender benchmark (full_eval.py:62-79,
# lego et al.) — so held-out PSNR in the high 20s/30s is achievable and
# MEANINGFUL: nothing in the GT pipeline touches the code under test.
# --------------------------------------------------------------------------


def _sphere_hit(orig, d, center, radius):
    """Vectorized ray-sphere: returns t (np.inf on miss), rays (N, 3)."""
    oc = orig - center
    b = np.einsum("ij,ij->i", d, oc)
    c = np.einsum("ij,ij->i", oc, oc) - radius * radius
    disc = b * b - c
    ok = disc > 0.0
    sq = np.sqrt(np.maximum(disc, 0.0))
    t = -b - sq
    t2 = -b + sq
    t = np.where(t > 1e-4, t, t2)  # inside-sphere fallback
    return np.where(ok & (t > 1e-4), t, np.inf)


def _checker(u, v, scale):
    return ((np.floor(u * scale) + np.floor(v * scale)) % 2.0)


_PALETTE = np.array(
    [
        [0.85, 0.25, 0.2], [0.2, 0.55, 0.85], [0.95, 0.75, 0.2],
        [0.3, 0.75, 0.4], [0.8, 0.4, 0.75], [0.9, 0.55, 0.3],
        [0.35, 0.8, 0.8], [0.6, 0.6, 0.9],
    ]
)

# Quality-corpus scene names, in increasing difficulty (VERDICT r3 next #3):
# spheres — the round-3 gate scene (8 textured spheres, checkered disk);
# thicket — thin structures + high-frequency textures (48 small spheres,
#           fine checker);
# glossy  — strong view-dependence (Blinn-Phong speculars) over a cluttered
#           two-tier layout.
ANALYTIC_SCENES = ("spheres", "thicket", "glossy")


def _analytic_scene(seed: int = 0, name: str = "spheres"):
    """Deterministic scene description: textured spheres over a checkered
    disk.  Returns (spheres, plane) where spheres is a list of dicts with
    keys c/r/base/alt/tex/freq/spec/shin (spec=0 -> pure lambertian)."""
    rng = np.random.default_rng(seed)
    palette = _PALETTE

    def sphere(pos, r, k, freq, spec=0.0, shin=32.0):
        return {
            "c": np.asarray(pos, np.float64),
            "r": float(r),
            "base": palette[k % 8],
            "alt": palette[(k + 3) % 8] * 0.35 + 0.6,
            "tex": k % 4,  # 0 checker, 1 stripes, 2 dots, 3 gradient
            "freq": float(freq),
            "spec": float(spec),
            "shin": float(shin),
        }

    plane = {"y": -1.0, "rad": 3.4, "c1": np.array([0.92, 0.92, 0.9]),
             "c2": np.array([0.18, 0.2, 0.24]), "scale": 1.25}
    spheres = []

    if name == "spheres":
        # ring of six + two central, radii varied, resting near the plane
        for k in range(8):
            if k < 6:
                ang = 2 * math.pi * k / 6
                r = 0.38 + 0.12 * ((k * 2654435761) % 97) / 97.0
                pos = [1.55 * math.cos(ang), -1.0 + r, 1.55 * math.sin(ang)]
            elif k == 6:
                r = 0.75
                pos = [0.0, -1.0 + r, 0.0]
            else:
                r = 0.3
                pos = [0.0, -1.0 + 1.5 + 0.45, 0.0]
            spheres.append(sphere(pos, r, k, rng.uniform(5.0, 9.0)))
    elif name == "thicket":
        # thin structures: 48 small spheres in two shells + a grounded ring,
        # all with high-frequency textures over a fine plane checker
        plane = dict(plane, scale=5.0)
        for k in range(48):
            u = rng.uniform()
            ang = 2 * math.pi * rng.uniform()
            if k % 3 == 0:  # grounded ring of pebbles
                r = rng.uniform(0.08, 0.16)
                rad = 1.1 + 1.3 * u
                pos = [rad * math.cos(ang), -1.0 + r, rad * math.sin(ang)]
            else:  # floating cluster (occlusion complexity)
                r = rng.uniform(0.06, 0.18)
                rad = 0.35 + 1.35 * u
                y = -0.75 + 1.5 * rng.uniform()
                pos = [rad * math.cos(ang), y, rad * math.sin(ang)]
            spheres.append(sphere(pos, r, k, rng.uniform(16.0, 32.0)))
    elif name == "glossy":
        # strong view-dependence: Blinn-Phong highlights on a cluttered
        # two-tier layout (ring + stack + satellites)
        for k in range(8):
            if k < 6:
                ang = 2 * math.pi * k / 6 + 0.3
                r = 0.34 + 0.14 * ((k * 40503) % 89) / 89.0
                pos = [1.5 * math.cos(ang), -1.0 + r, 1.5 * math.sin(ang)]
            elif k == 6:
                r = 0.7
                pos = [0.0, -1.0 + r, 0.0]
            else:
                r = 0.34
                pos = [0.0, -1.0 + 1.4 + 0.5, 0.0]
            spheres.append(
                sphere(pos, r, k, rng.uniform(7.0, 13.0),
                       spec=rng.uniform(0.5, 0.9),
                       shin=rng.uniform(24.0, 64.0))
            )
        for k in range(8, 18):  # glossy satellites
            ang = 2 * math.pi * rng.uniform()
            rad = 0.9 + 1.5 * rng.uniform()
            r = rng.uniform(0.1, 0.2)
            y = -1.0 + r + 1.1 * rng.uniform()
            spheres.append(
                sphere([rad * math.cos(ang), y, rad * math.sin(ang)], r, k,
                       rng.uniform(10.0, 18.0),
                       spec=rng.uniform(0.4, 0.8), shin=48.0)
            )
    else:
        raise ValueError(f"unknown analytic scene: {name}")
    return spheres, plane


def _shade_analytic(orig, d, spheres, plane):
    """Trace rays (N, 3): returns (rgb (N, 3), alpha (N,), t (N,)).

    ``t`` is the ray-parameter of the hit (np.inf on background) — the
    camera-space depth follows as t * (d . forward), giving analytically
    exact inverse-depth GT for the depth-regularization ablation."""
    N = d.shape[0]
    best_t = np.full(N, np.inf)
    best_id = np.full(N, -1, np.int32)  # -2 == plane
    for i, s in enumerate(spheres):
        t = _sphere_hit(orig, d, s["c"], s["r"])
        hit = t < best_t
        best_t = np.where(hit, t, best_t)
        best_id = np.where(hit, i, best_id)
    # plane disk
    denom = d[:, 1]
    tp = np.where(np.abs(denom) > 1e-8, (plane["y"] - orig[:, 1]) / denom, np.inf)
    pxz = orig[:, [0, 2]] + tp[:, None] * d[:, [0, 2]]
    on_disk = (tp > 1e-4) & (np.einsum("ij,ij->i", pxz, pxz) < plane["rad"] ** 2)
    hit = on_disk & (tp < best_t)
    best_t = np.where(hit, tp, best_t)
    best_id = np.where(hit, -2, best_id)

    alpha = (best_id != -1).astype(np.float32)
    p = orig + np.where(np.isfinite(best_t), best_t, 0.0)[:, None] * d
    rgb = np.zeros((N, 3))

    lights = [
        (np.array([0.45, 0.8, 0.35]) / np.linalg.norm([0.45, 0.8, 0.35]), 0.75),
        (np.array([-0.6, 0.55, -0.5]) / np.linalg.norm([-0.6, 0.55, -0.5]), 0.45),
    ]
    ambient = 0.25

    def light_term(pts, nrm, view_d, spec, shin):
        """Shadowed Blinn-Phong terms for a COMPRESSED point set (M, 3):
        returns (diffuse (M,), specular (M,))."""
        lit = np.full(pts.shape[0], ambient)
        sp = np.zeros(pts.shape[0])
        for ldir, lpow in lights:
            lam = np.maximum(nrm @ ldir, 0.0)
            # hard shadows: any sphere blocks the light ray
            shadow = np.zeros(pts.shape[0], bool)
            po = pts + 1e-3 * nrm
            ld = np.broadcast_to(ldir, pts.shape)
            for s in spheres:
                shadow |= np.isfinite(_sphere_hit(po, ld, s["c"], s["r"]))
            unsh = lpow * (~shadow)
            lit = lit + unsh * lam
            if spec > 0.0:
                h = ldir[None, :] - view_d
                h = h / np.linalg.norm(h, axis=1, keepdims=True)
                sp = sp + unsh * spec * np.maximum(
                    np.einsum("ij,ij->i", nrm, h), 0.0
                ) ** shin
        return lit, sp

    # plane shading (index-compressed: shadow rays only for actual hits)
    idx = np.nonzero(best_id == -2)[0]
    if idx.size:
        pp = p[idx]
        u, v = pp[:, 0], pp[:, 2]
        ck = _checker(u, v, plane["scale"])[:, None]
        base = np.where(ck > 0.5, plane["c1"], plane["c2"])
        nrm = np.broadcast_to(np.array([0.0, 1.0, 0.0]), pp.shape)
        lit, _sp = light_term(pp, nrm, d[idx], 0.0, 1.0)
        rgb[idx] = base * lit[:, None]

    # sphere shading
    for i, s in enumerate(spheres):
        idx = np.nonzero(best_id == i)[0]
        if not idx.size:
            continue
        pp = p[idx]
        nrm = (pp - s["c"]) / s["r"]
        theta = np.arccos(np.clip(nrm[:, 1], -1, 1))
        phi = np.arctan2(nrm[:, 2], nrm[:, 0])
        f = s["freq"]
        if s["tex"] == 0:
            m = _checker(phi / (2 * math.pi) + 1.0, theta / math.pi, f)
        elif s["tex"] == 1:
            m = (np.sin(theta * f * 2.0) > 0).astype(np.float64)
        elif s["tex"] == 2:
            m = ((np.sin(phi * f) * np.sin(theta * f)) > 0.3).astype(np.float64)
        else:
            m = 0.5 + 0.5 * np.sin(theta * 3.0)
        base = s["base"] * (1 - m[:, None]) + s["alt"] * m[:, None]
        lit, sp = light_term(
            pp, nrm, d[idx], s.get("spec", 0.0), s.get("shin", 32.0)
        )
        rgb[idx] = base * lit[:, None] + sp[:, None]

    return np.clip(rgb, 0.0, 1.0), alpha, best_t


_FAST_SHADER_CACHE: dict = {}


def _shade_analytic_fast(orig, d, spheres, plane):
    """jax.jit (CPU) implementation of ``_shade_analytic`` — same math, one
    fused pass in f32 (the pure-numpy version runs ~50 s/frame on the 1-vCPU
    host).  GT stays independent of the code under test: nothing here
    touches the Gaussian renderer.  Parity with the numpy reference is
    asserted in tests/test_components.py.  The jitted closure is cached per
    scene so repeated frames don't re-trace."""
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    scene_key = (
        tuple(
            (tuple(s["c"]), s["r"], tuple(s["base"]), tuple(s["alt"]),
             s["tex"], s["freq"], s.get("spec", 0.0), s.get("shin", 32.0))
            for s in spheres
        ),
        (plane["y"], plane["rad"], tuple(plane["c1"]), tuple(plane["c2"]),
         plane["scale"]),
    )
    if scene_key in _FAST_SHADER_CACHE:
        shade = _FAST_SHADER_CACHE[scene_key]
        with jax.default_device(cpu):
            rgb, alpha, t = shade(
                jnp.asarray(orig, jnp.float32), jnp.asarray(d, jnp.float32)
            )
            return (np.asarray(rgb, np.float64), np.asarray(alpha, np.float64),
                    np.asarray(t, np.float64))
    sph_c = np.stack([s["c"] for s in spheres]).astype(np.float32)
    sph_r = np.array([s["r"] for s in spheres], np.float32)
    sph_base = np.stack([s["base"] for s in spheres]).astype(np.float32)
    sph_alt = np.stack([s["alt"] for s in spheres]).astype(np.float32)
    sph_tex = np.array([s["tex"] for s in spheres], np.int32)
    sph_freq = np.array([s["freq"] for s in spheres], np.float32)
    sph_spec = np.array([s.get("spec", 0.0) for s in spheres], np.float32)
    sph_shin = np.array([s.get("shin", 32.0) for s in spheres], np.float32)
    nsph = len(spheres)

    lights = [
        (np.array([0.45, 0.8, 0.35]) / np.linalg.norm([0.45, 0.8, 0.35]), 0.75),
        (np.array([-0.6, 0.55, -0.5]) / np.linalg.norm([-0.6, 0.55, -0.5]), 0.45),
    ]
    ambient = 0.25

    def hit(orig, d, c, r):
        oc = orig - c
        b = jnp.einsum("ij,ij->i", d, oc)
        cc = jnp.einsum("ij,ij->i", oc, oc) - r * r
        disc = b * b - cc
        ok = disc > 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = -b - sq
        t = jnp.where(t > 1e-4, t, -b + sq)
        return jnp.where(ok & (t > 1e-4), t, jnp.inf)

    @jax.jit
    def shade(orig, d):
        N = d.shape[0]
        best_t = jnp.full((N,), jnp.inf, jnp.float32)
        best_id = jnp.full((N,), -1, jnp.int32)
        for i in range(nsph):
            t = hit(orig, d, sph_c[i], sph_r[i])
            w = t < best_t
            best_t = jnp.where(w, t, best_t)
            best_id = jnp.where(w, i, best_id)
        denom = d[:, 1]
        tp = jnp.where(
            jnp.abs(denom) > 1e-8, (plane["y"] - orig[:, 1]) / denom, jnp.inf
        )
        pxz = orig[:, [0, 2]] + tp[:, None] * d[:, [0, 2]]
        on_disk = (tp > 1e-4) & (
            jnp.einsum("ij,ij->i", pxz, pxz) < plane["rad"] ** 2
        )
        w = on_disk & (tp < best_t)
        best_t = jnp.where(w, tp, best_t)
        best_id = jnp.where(w, -2, best_id)

        alpha = (best_id != -1).astype(jnp.float32)
        p = orig + jnp.where(jnp.isfinite(best_t), best_t, 0.0)[:, None] * d

        # winning-sphere parameters via gather; transcendentals run ONCE
        sid = jnp.clip(best_id, 0, nsph - 1)
        c_win = jnp.asarray(sph_c)[sid]
        r_win = jnp.asarray(sph_r)[sid]
        nrm_s = (p - c_win) / r_win[:, None]
        is_plane = best_id == -2
        nrm = jnp.where(
            is_plane[:, None], jnp.array([0.0, 1.0, 0.0], jnp.float32), nrm_s
        )
        theta = jnp.arccos(jnp.clip(nrm_s[:, 1], -1, 1))
        phi = jnp.arctan2(nrm_s[:, 2], nrm_s[:, 0])
        f = jnp.asarray(sph_freq)[sid]
        chk = (
            jnp.floor(phi / (2 * math.pi) * f + f) + jnp.floor(theta / math.pi * f)
        ) % 2.0
        m_all = jnp.stack(
            [
                chk,
                (jnp.sin(theta * f * 2.0) > 0).astype(jnp.float32),
                ((jnp.sin(phi * f) * jnp.sin(theta * f)) > 0.3).astype(
                    jnp.float32
                ),
                0.5 + 0.5 * jnp.sin(theta * 3.0),
            ],
            axis=1,
        )
        m = jnp.take_along_axis(m_all, jnp.asarray(sph_tex)[sid][:, None], axis=1)[:, 0]
        base_s = jnp.asarray(sph_base)[sid] * (1 - m[:, None]) + jnp.asarray(sph_alt)[sid] * m[:, None]
        ck = (jnp.floor(p[:, 0] * plane["scale"]) + jnp.floor(p[:, 2] * plane["scale"])) % 2.0
        base_p = jnp.where(
            ck[:, None] > 0.5,
            plane["c1"].astype(np.float32),
            plane["c2"].astype(np.float32),
        )
        base = jnp.where(is_plane[:, None], base_p, base_s)

        # shadowed two-light Blinn-Phong, computed once over all hit points
        spec = jnp.where(is_plane, 0.0, jnp.asarray(sph_spec)[sid])
        shin = jnp.asarray(sph_shin)[sid]
        lit = jnp.full((N,), ambient, jnp.float32)
        sp = jnp.zeros((N,), jnp.float32)
        po = p + 1e-3 * nrm
        has_spec = bool(np.any(sph_spec > 0.0))
        for ldir, lpow in lights:
            ldirf = ldir.astype(np.float32)
            ld = jnp.broadcast_to(ldirf, p.shape)
            lam = jnp.maximum(nrm @ ldirf, 0.0)
            shadow = jnp.zeros((N,), bool)
            for i in range(nsph):
                shadow |= jnp.isfinite(hit(po, ld, sph_c[i], sph_r[i]))
            unsh = lpow * (~shadow)
            lit = lit + unsh * lam
            if has_spec:
                h = ldirf[None, :] - d
                h = h / jnp.linalg.norm(h, axis=1, keepdims=True)
                sp = sp + unsh * spec * jnp.maximum(
                    jnp.einsum("ij,ij->i", nrm, h), 0.0
                ) ** shin
        rgb = jnp.clip(base * lit[:, None] + sp[:, None], 0.0, 1.0)
        rgb = jnp.where((best_id == -1)[:, None], 0.0, rgb)
        return rgb, alpha, best_t

    _FAST_SHADER_CACHE[scene_key] = shade
    with jax.default_device(cpu):
        rgb, alpha, t = shade(
            jnp.asarray(orig, jnp.float32), jnp.asarray(d, jnp.float32)
        )
        return (np.asarray(rgb, np.float64), np.asarray(alpha, np.float64),
                np.asarray(t, np.float64))


def generate_analytic_dataset(
    out_dir: str,
    *,
    num_train: int = 100,
    num_test: int = 12,
    width: int = 800,
    height: int = 600,
    fovx: float = 0.85,
    radius: float = 4.4,
    seed: int = 0,
    supersample: int = 2,
    scene_name: str = "spheres",
    depths: bool = False,
    exposure_jitter: float = 0.0,
) -> str:
    """Blender-format dataset (transforms_{train,test}.json + RGBA PNGs)
    whose GT images come from the numpy/jax raytracer above.  Use with
    ``--white_background`` like the reference's NeRF-synthetic protocol.

    scene_name: one of ANALYTIC_SCENES (increasing difficulty).
    depths: also write analytically exact inverse-depth maps to depths/
      as uint16 PNGs at the synthetic /512 scale (data/cameras.py:170) —
      feeds the --use_depth ablation with GT no monocular estimator can
      match.
    exposure_jitter: if > 0, each TRAIN image is perturbed by a random
      per-channel affine gain/offset of that magnitude (test views stay
      clean) — the --use_expcomp ablation must recover it through the
      per-image exposure optimization (reference full_eval.py:55-56).
    """
    import imageio.v2 as imageio

    spheres, plane = _analytic_scene(seed, scene_name)
    os.makedirs(os.path.join(out_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "test"), exist_ok=True)
    if depths:
        os.makedirs(os.path.join(out_dir, "depths"), exist_ok=True)

    W, H = width * supersample, height * supersample
    f = 0.5 * W / math.tan(fovx / 2.0)
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    xs = (jj.ravel() + 0.5 - W / 2) / f
    ys = (ii.ravel() + 0.5 - H / 2) / f
    d_cam = np.stack([xs, ys, np.ones_like(xs)], axis=1)
    # camera-z per unit ray parameter (rays get normalized): z = t / |d_cam|
    inv_dnorm = 1.0 / np.linalg.norm(d_cam, axis=1)

    rng = np.random.default_rng(seed + 1)

    def render_pose(theta, phi):
        (R, t), eye = _orbit_pose(theta, phi, radius)
        d = d_cam @ R.T  # R is cam-to-world; camera axes are its columns
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
        orig = np.broadcast_to(eye, d.shape)
        rgb, alpha, thit = _shade_analytic_fast(orig, d, spheres, plane)
        img = np.concatenate([rgb, alpha[:, None]], axis=1).reshape(H, W, 4)
        # box-filter downsample (supersampled anti-aliased GT)
        s = supersample
        img = img.reshape(height, s, width, s, 4).mean(axis=(1, 3))
        # analytically exact inverse camera-depth (0 on background), box-
        # filtered like the renderer's alpha-weighted invdepth accumulation
        invd = np.where(np.isfinite(thit), inv_dnorm / np.maximum(thit, 1e-6), 0.0)
        invd = invd.reshape(height, s, width, s).mean(axis=(1, 3))
        Rt = np.zeros((4, 4))
        Rt[:3, :3] = R.T
        Rt[:3, 3] = t
        Rt[3, 3] = 1.0
        c2w = np.linalg.inv(Rt)
        c2w[:3, 1:3] *= -1  # COLMAP -> OpenGL
        return img, invd, c2w

    for split, count in (("train", num_train), ("test", num_test)):
        frames = []
        for i in range(count):
            # golden-angle azimuth sweep, elevation varied deterministically
            theta = 2 * math.pi * ((i * 0.618034) % 1.0) + (
                0.26 if split == "test" else 0.0
            )
            phi = float(0.12 + 0.55 * ((i * 29) % count) / max(count - 1, 1))
            if split == "test":
                phi = float(0.15 + 0.5 * (i / max(num_test - 1, 1)))
            img, invd, c2w = render_pose(theta, phi)
            if exposure_jitter > 0.0 and split == "train":
                gain = 1.0 + rng.uniform(
                    -exposure_jitter, exposure_jitter, (3,)
                )
                off = rng.uniform(
                    -0.25 * exposure_jitter, 0.25 * exposure_jitter, (3,)
                )
                img = img.copy()
                img[..., :3] = img[..., :3] * gain + off * img[..., 3:4]
            # globally-unique stems: depths/<stem>.png is shared across
            # splits (data/dataset.py:187), so r_<i> alone would collide
            k = i if split == "train" else num_train + i
            rel = f"./{split}/r_{k}"
            imageio.imwrite(
                os.path.join(out_dir, f"{split}/r_{k}.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8),
            )
            if depths:
                # uint16 at the synthetic /512 scale (cameras.py:170);
                # invd <= 1/~2 here so the range is ample
                imageio.imwrite(
                    os.path.join(out_dir, f"depths/r_{k}.png"),
                    np.minimum(invd * 512.0, 65535.0).astype(np.uint16),
                )
            frames.append({"file_path": rel, "transform_matrix": c2w.tolist()})
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as fjs:
            json.dump({"camera_angle_x": fovx, "frames": frames}, fjs)
    return out_dir
