"""BASELINE.json config acceptance matrix.

Runs the five named configs exactly as BASELINE.json specifies them
(resolutions, spp, depth, animation, inverse fit) on the live device and
writes CONFIGS_r<N>.json with per-config correctness + performance:

  1. Single diffuse sphere + ground plane, 1spp, 256x256, direct light
     only — image allclose vs a NumPy re-execution of the GLSL math
     (cpu_reference/glslref.py building blocks).
  2. Cornell-style sphere scene with MIS (BSDF + light sampling), 4spp,
     512x512 — fused Pallas frame vs the XLA pass pipeline.
  3. Specular/dielectric BSDFs, PCG+R2 sampler, multi-bounce depth 6 —
     fused path kernel vs the lax.scan wavefront integrator.
  4. Temporal reprojection, animated camera (the reference's pose spline),
     diffuse+specular history accumulation at 1080p — fused temporal frame
     vs the pass pipeline after an 8-frame animated warmup, plus history
     accumulation checks.
  5. Inverse rendering: gradient recovery of a 10-sphere scene from
     multi-view targets (single chip), plus the multi-host sharded train
     step checked against single-device on a virtual 8-device CPU mesh
     (subprocess; the same witness __graft_entry__.dryrun_multichip runs).

Usage: python bench_configs.py [round_number]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")

import numpy as np
import jax
import jax.numpy as jnp

from kylespathtracer_tpu import (
    Camera,
    RenderConfig,
    default_scene,
    init_history,
    render_frame,
)
from kylespathtracer_tpu.cpu_reference import glslref as ref
from kylespathtracer_tpu.scene.scene import sphere_scene
from kylespathtracer_tpu.scene.types import BSDF


def _sync(tree) -> float:
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if isinstance(l, jax.Array)]
    acc = jnp.zeros((), jnp.float32)
    for l in leaves:
        acc = acc + jnp.sum(jnp.abs(l).astype(jnp.float32))
    return float(jax.device_get(acc))


def _scan_ms(step_of_i, ks=(2, 8, 14), reps=2):
    """Device-resident per-step ms (scan slope; see bench.py)."""
    times = []
    for K in ks:
        @jax.jit
        def run():
            def body(acc, i):
                return acc + step_of_i(i), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.int32)
            )
            return acc
        _sync(run())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(run())
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return (times[-1] - times[0]) / (ks[-1] - ks[0]) * 1e3


def _img_diff(a, b):
    d = np.abs(np.asarray(a) - np.asarray(b))
    return {
        "median_abs": float(np.median(d)),
        "frac_gt_3e-2": float((d > 3e-2).mean()),
        "finite": bool(np.isfinite(np.asarray(a)).all()),
    }


# ---------------------------------------------------------------- config 1

def _oracle_direct_light(scene, cam, W, H, frame=0):
    """NumPy re-execution of the GLSL math for the direct-light-only frame
    on a sphere(+floor) scene: raygen (geometry.frag:38-39,67), analytic
    nearest hit, per-pixel Weyl seed (common.glsl:39-41), cone light sample
    + solid-angle pdf (common.glsl:300-305), biased light contribution
    (common.glsl:348-353), Lambert/Phong weights (diffuse/specular pass
    direct blocks), composite + ACES + sRGB (passthrough.frag:29-47)."""
    planes = np.asarray(scene.planes)
    plane_ids = np.asarray(scene.plane_ids)
    spheres = np.asarray(scene.spheres)
    sphere_ids = np.asarray(scene.sphere_ids)
    light = np.asarray(scene.light)
    light_color = np.asarray(scene.light_color)
    mats = jax.tree_util.tree_map(np.asarray, scene.materials)
    light_id = int(sphere_ids[int(scene.light_index)])

    asp = W / H
    px = np.arange(W, dtype=np.float32)[None, :] + 0.5
    py = np.arange(H, dtype=np.float32)[:, None] + 0.5
    x = (2 * px / W - 1) * asp + np.zeros((H, W), np.float32)
    y = (2 * py / H - 1) + np.zeros((H, W), np.float32)
    z = np.full((H, W), ref.FOV, np.float32)
    d = np.stack([x, y, z], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = ref.rotate_xy(d.astype(np.float32), np.asarray(cam.orient))
    ro = np.asarray(cam.loc)

    def nearest(o, dirs, excl):
        best_t = np.full(dirs.shape[:-1], 1e9, np.float32)
        best_id = np.zeros(dirs.shape[:-1], np.int32)

        def consider(t, oid, valid):
            nonlocal best_t, best_id
            v = valid & (t > 0) & (oid != excl) & (t < best_t)
            best_t = np.where(v, t, best_t)
            best_id = np.where(v, oid, best_id)

        for p in range(planes.shape[0]):
            n = planes[p, :3]
            w = planes[p, 3]
            denom = dirs @ n
            sd0 = (o * n).sum(-1) + w
            t = -sd0 / np.where(np.abs(denom) < 1e-12, 1e-12, denom)
            consider(t.astype(np.float32), plane_ids[p], denom < -1e-7)
        for s in range(spheres.shape[0]):
            oc = o - spheres[s, :3]
            b = (oc * dirs).sum(-1)
            c2 = (oc * oc).sum(-1) - spheres[s, 3] ** 2
            disc = b * b - c2
            t = (-b - np.sqrt(np.maximum(disc, 1e-12))).astype(np.float32)
            consider(t, sphere_ids[s], disc > 0)
        t = best_t - ref.EPS
        miss = (t > ref.ZFAR) | (best_id == 0)
        return np.where(miss, ref.ZFAR, t), np.where(miss, 0, best_id)

    t, oid = nearest(ro, rd, -1)
    hl = ro + rd * t[..., None]
    hit = oid > 0
    # Normals.
    hn = np.zeros_like(hl)
    for p in range(planes.shape[0]):
        hn = np.where((oid == plane_ids[p])[..., None], planes[p, :3], hn)
    for s in range(spheres.shape[0]):
        dv = hl - spheres[s, :3]
        nv = dv / np.maximum(np.linalg.norm(dv, axis=-1, keepdims=True), 1e-12)
        hn = np.where((oid == sphere_ids[s])[..., None], nv, hn)
    hn = np.where(hit[..., None], hn, 0.0)

    # Per-pixel Weyl seed + cone sample toward the light.
    pxi = np.arange(W, dtype=np.int64)[None, :] + np.zeros((H, W), np.int64)
    pyi = np.arange(H, dtype=np.int64)[:, None] + np.zeros((H, W), np.int64)
    seed = ref.gen_seed(frame, pxi, pyi, W, H)
    lv = (light[:3] - hl).astype(np.float32)
    dl = ref.uniform_cone_dir(lv, light[3], seed).astype(np.float32)
    pdf = ref.solid_angle((lv * lv).sum(-1), light[3] ** 2).astype(np.float32)
    _, vid = nearest(hl, dl, oid)
    base = np.where((vid == light_id)[..., None], light_color, 0.0)

    lam = np.maximum(ref.EPS, (dl * hn).sum(-1))
    refl = rd - 2 * (rd * hn).sum(-1, keepdims=True) * hn
    pho = np.maximum(ref.EPS, (dl * refl).sum(-1)) ** 5.0

    # Materials (scene/materials.surface semantics).
    def surface(o_ids, pts):
        alb = np.zeros(pts.shape, np.float32)
        emi = np.zeros(pts.shape, np.float32)
        ene = np.zeros(pts.shape[:-1] + (2,), np.float32)
        for k in range(mats.s0.shape[0]):
            sel = o_ids == k
            fq = mats.freq[k]
            sv = (np.floor(pts[..., 0] * fq) + np.floor(pts[..., 1] * fq)
                  + np.floor(pts[..., 2] * fq))
            checker = np.abs(np.mod(sv, 2.0))
            sval = mats.s0[k] + mats.s1[k] * checker
            alb = np.where(sel[..., None],
                           mats.alb_const[k] + mats.alb_scale[k] * sval[..., None],
                           alb)
            emi = np.where(sel[..., None], mats.emission[k], emi)
            ene = np.where(sel[..., None],
                           mats.en_const[k] + mats.en_scale[k] * sval[..., None],
                           ene)
        return alb, emi, ene

    alb, emi, ene = surface(oid, hl)
    shade = hit & (oid != light_id)
    est_d = emi + np.where(shade[..., None], base * (pdf * lam)[..., None], 0.0)
    est_s = emi + np.where(shade[..., None], base * (pdf * pho)[..., None], 0.0)

    pos = alb > 0
    alb_sqrt = np.where(pos, np.sqrt(np.where(pos, alb, 1.0)), 0.0)
    img = est_d * alb * ene[..., 0:1] + est_s * alb_sqrt * ene[..., 1:2]
    img = ref.aces_fitted((img * np.float32(10.0)).astype(np.float32))
    return ref.linear_srgb(img).astype(np.float32)


def config1():
    W = H = 256
    scene = sphere_scene(
        centers=[[0.0, 1.0, 6.0]], radii=[1.0], albedos=[[0.7, 0.3, 0.2]]
    )
    cam = Camera.create(loc=(0.0, 2.0, -2.0), orient=(-0.15, 0.0))
    cfg = RenderConfig(
        width=W, height=H, no_history=True, pipeline="pass",
        smp_direct_lambert=1, smp_lambert_surface_lambert=0,
        smp_lambert_surface_phong=0, smp_direct_phong=1,
        smp_phong_surface_lambert=0, smp_phong_surface_phong=0,
    )
    hist = init_history(cfg, cam)
    t0 = time.perf_counter()
    img, _ = jax.jit(render_frame, static_argnames=("config",))(
        scene, cam, hist, jnp.asarray(0, jnp.int32), cfg
    )
    _sync(img)
    compile_s = time.perf_counter() - t0
    oracle = _oracle_direct_light(scene, cam, W, H)
    diff = _img_diff(img, oracle)
    ok = diff["finite"] and diff["median_abs"] < 1e-5 and diff["frac_gt_3e-2"] < 0.01
    return {
        "name": "direct-light-sphere-plane-256",
        "spec": "1 diffuse sphere + ground plane, 1spp, 256x256, direct light only, vs CPU GLSL-math re-execution",
        "passed": bool(ok), "diff": diff, "compile_s": round(compile_s, 1),
    }


# ---------------------------------------------------------------- config 2

def config2():
    W = H = 512
    rng = np.random.default_rng(7)
    scene = sphere_scene(
        centers=np.stack([rng.uniform(-4, 4, 6), rng.uniform(0.7, 3.5, 6),
                          rng.uniform(4, 10, 6)], axis=-1),
        radii=rng.uniform(0.5, 1.0, 6),
        albedos=rng.uniform(0.2, 0.9, (6, 3)),
    )
    cam = Camera.create(loc=(0.0, 3.0, -4.0), orient=(-0.15, 0.0))
    smp4 = {f"smp_{k}": 4 for k in (
        "direct_lambert", "lambert_surface_lambert", "lambert_surface_phong",
        "direct_phong", "phong_surface_lambert", "phong_surface_phong")}
    imgs = {}
    for pipe in ("fused", "pass"):
        cfg = RenderConfig(width=W, height=H, no_history=True, pipeline=pipe, **smp4)
        hist = init_history(cfg, cam)
        img, _ = jax.jit(render_frame, static_argnames=("config",))(
            scene, cam, hist, jnp.asarray(0, jnp.int32), cfg
        )
        _sync(img)
        imgs[pipe] = img
    diff = _img_diff(imgs["fused"], imgs["pass"])
    cfg = RenderConfig(width=W, height=H, no_history=True, pipeline="fused", **smp4)
    hist = init_history(cfg, cam)
    ms = _scan_ms(lambda i: render_frame(scene, cam, hist, i, cfg)[0][0, 0, 0])
    ok = diff["finite"] and diff["median_abs"] < 1e-5 and diff["frac_gt_3e-2"] < 0.02
    return {
        "name": "cornell-mis-4spp-512",
        "spec": "Cornell-style sphere scene, full MIS (BSDF+light), 4spp, 512x512, fused vs pass",
        "passed": bool(ok), "diff": diff,
        "frame_ms": round(ms, 2),
        "rays_per_s": round(W * H * 4 / (ms * 1e-3), 1),
    }


# ---------------------------------------------------------------- config 3

def config3():
    from kylespathtracer_tpu.render import wavefront as wf

    W, H = 512, 512
    scene = sphere_scene(
        centers=[[-1.5, 1.0, 6.0], [1.5, 1.2, 6.5], [0.0, 0.8, 4.5]],
        radii=[1.0, 1.2, 0.8],
        albedos=[[0.9, 0.9, 0.9], [0.7, 0.8, 0.9], [0.9, 0.6, 0.5]],
        kinds=[BSDF.MIRROR, BSDF.DIELECTRIC, BSDF.DIFFUSE],
        iors=[1.5, 1.5, 1.5],
    )
    cam = Camera.create(loc=(0.0, 2.0, -2.0), orient=(-0.1, 0.0))
    spp, depth = 4, 6
    imgs = {}
    for backend in ("pallas", "xla"):
        cfg = RenderConfig(width=W, height=H, spp=spp, max_depth=depth,
                           path_backend=backend)
        img = jax.jit(wf.render_pathtraced, static_argnames=("config",))(
            scene, cam, cfg, jnp.asarray(0, jnp.int32)
        )
        _sync(img)
        imgs[backend] = img
    diff = _img_diff(imgs["pallas"], imgs["xla"])
    cfg = RenderConfig(width=W, height=H, spp=spp, max_depth=depth)
    ms = _scan_ms(
        lambda i: wf.render_pathtraced(scene, cam, cfg, i)[0, 0, 0],
        ks=(1, 4, 7),
    )
    ok = diff["finite"] and diff["median_abs"] < 1e-4 and diff["frac_gt_3e-2"] < 0.02
    return {
        "name": "dielectric-depth6",
        "spec": "specular/dielectric BSDFs, PCG+R2 sampler, 4spp, depth 6, 512x512, path kernel vs scan integrator",
        "passed": bool(ok), "diff": diff,
        "frame_ms": round(ms, 2),
        "segments_per_s": round(W * H * spp * depth / (ms * 1e-3), 1),
    }


# ---------------------------------------------------------------- config 4

def config4():
    from kylespathtracer_tpu.ops import frame_kernel as fk
    from kylespathtracer_tpu.render.camera import camera_pose_spline, ray_dirs

    W, H = 1920, 1080
    scene = default_scene()
    frames = 8

    def animated(pipe, keep_cnt=False):
        cfg = RenderConfig(width=W, height=H, pipeline=pipe)
        cam0 = Camera.create()
        hist = init_history(cfg, Camera.create())
        fn = jax.jit(render_frame, static_argnames=("config",))
        img = None
        cams, cnts = [], []
        for i in range(frames):
            loc, ori = camera_pose_spline(jnp.float32(i) * 0.05)
            cam = cam0.replace(loc=loc, orient=ori)
            cams.append(cam)
            img, hist = fn(scene, cam, hist, jnp.asarray(i, jnp.int32), cfg)
            if keep_cnt:
                cnts.append((
                    np.asarray(hist.diffuse.cnt), np.asarray(hist.specular.cnt)
                ))
        _sync((img, hist))
        return img, hist, cams, cnts

    img_f, hist_f, cams, _ = animated("fused")
    img_p, hist_p, _, cnts = animated("pass", keep_cnt=True)
    diff = _img_diff(img_f, img_p)
    cnt_mean = float(jnp.mean(hist_f.diffuse.cnt))
    # Accumulation must actually build history under the slow pan.
    accum_ok = 2.0 < cnt_mean <= 16.0

    # --- Classify the differing pixels (round-4 verdict item 6). The claim
    # "decision-boundary flips" is demonstrated, not asserted: every
    # >3e-2 pixel must lie on the union of
    #   (a) geometric decision boundaries — object-ID edges and material
    #       checker-cell edges (4³ cells on the box, unit cells on floor/
    #       ceiling; common.glsl:244,250), where a half-ulp intersection
    #       difference flips the shaded object or checker color, and
    #   (b) history-state gradients — pixels whose accumulated sample count
    #       differs from a 4-neighbor in ANY frame, where the bilinear
    #       history reconstruction sits on a knife edge (taps with unequal
    #       counts + projection fractions near a texel center: the fused
    #       kernel's component-form projection and XLA's vector form can
    #       land on opposite sides at the ~1e-7 level),
    # dilated by 2 px for reprojection drift of flips carried through the
    # history. INTERIOR pixels (uniform object, uniform checker cell,
    # uniform history state all 8 frames) must agree essentially exactly.
    d_img = np.abs(np.asarray(img_f) - np.asarray(img_p))
    flagged = (d_img > 3e-2).any(axis=-1)
    gcfg = RenderConfig(width=W, height=H)
    mask = np.zeros((H, W), bool)
    for i, cam in enumerate(cams):
        g = fk.geometry_pass_pallas(scene, cam, jnp.asarray(i, jnp.int32), gcfg)
        oid = np.asarray(g["oid"])
        depth = np.asarray(g["depth"])
        rd = np.asarray(ray_dirs(cam, W, H, gcfg.fov))
        hl = np.asarray(cam.loc) + rd * depth[..., None]
        cell = np.zeros((H, W, 3), np.int64)
        boxm = oid == 4
        flr = (oid == 2) | (oid == 7)
        cell[boxm] = np.floor(4 * hl[boxm]).astype(np.int64)
        cell[flr] = np.floor(hl[flr]).astype(np.int64)
        for ax, s in ((0, 1), (0, -1), (1, 1), (1, -1)):
            mask |= np.roll(oid, s, axis=ax) != oid
            mask |= (np.roll(cell, s, axis=ax) != cell).any(axis=-1)
    for cd, cs in cnts:
        for ax, s in ((0, 1), (0, -1), (1, 1), (1, -1)):
            mask |= np.roll(cd, s, axis=ax) != cd
            mask |= np.roll(cs, s, axis=ax) != cs
    for _ in range(2):  # dilate by 2 px
        mask = (
            mask | np.roll(mask, 1, 0) | np.roll(mask, -1, 0)
            | np.roll(mask, 1, 1) | np.roll(mask, -1, 1)
        )
    interior = ~mask
    on_mask = float((flagged & mask).sum() / max(flagged.sum(), 1))
    # interior can in principle be empty (mask covering every pixel);
    # record that as vacuous agreement instead of crashing on empty .max().
    interior_bad = (
        float((d_img[interior] > 1e-3).mean()) if interior.any() else 0.0
    )
    boundary = {
        "flagged_px_frac": float(flagged.mean()),
        "mask_frac": float(mask.mean()),
        "flagged_on_mask_frac": on_mask,
        "interior_frac_gt_1e-3": interior_bad,
        "interior_max_abs": (
            float(d_img[interior].max()) if interior.any() else 0.0
        ),
    }
    # Measured r05 on v5e: with the split temporal pipeline (the default)
    # fused-vs-pass agrees to ~1 flagged PIXEL per 2M (frac_gt_3e-2
    # 3e-7); with temporal_fusion="mono" it was 0.18% flagged, 99.9% on
    # the mask, interior frac>1e-3 2.7e-5. When almost nothing is flagged
    # the on-mask ratio is a ratio of counting noise — skip it below 50
    # flagged pixels and keep only the interior-agreement gate.
    boundary_ok = interior_bad < 1e-4 and (
        flagged.sum() < 50 or on_mask >= 0.95
    )

    cfg = RenderConfig(width=W, height=H, pipeline="fused")
    hist = init_history(cfg, Camera.create())
    cam0 = Camera.create()

    def step(i):
        loc, ori = camera_pose_spline(i.astype(jnp.float32) * 0.05)
        cam = cam0.replace(loc=loc, orient=ori)
        img, h = render_frame(scene, cam, hist, i, cfg)
        return img[0, 0, 0] + h.diffuse.cnt[0, 0]

    ms = _scan_ms(step, ks=(2, 8, 14))
    ok = (
        diff["finite"] and diff["frac_gt_3e-2"] < 0.005 and accum_ok
        and boundary_ok
    )
    return {
        "name": "temporal-1080p",
        "spec": "animated camera (reference pose spline), diffuse+specular temporal accumulation, 1080p, fused vs pass after 8 frames; differing pixels classified as decision-boundary flips",
        "passed": bool(ok), "diff": diff,
        "boundary_classification": boundary,
        "history_cnt_mean": round(cnt_mean, 2), "accum_ok": bool(accum_ok),
        "frame_ms": round(ms, 2),
        "rays_per_s": round(W * H / (ms * 1e-3), 1),
    }


# ---------------------------------------------------------------- config 5

def config5():
    from kylespathtracer_tpu.diff import inverse

    # The RECOVERY recipe (round 3: err_position 0.0016 at steps=798/views=5).
    t0 = time.perf_counter()
    result = inverse.run_recovery(
        num_spheres=10, steps=800, width=192, height=128, views=5,
        betas=(0.05, 0.02, 0.008, 0.003),
    )
    wall = time.perf_counter() - t0
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "RECOVERY.json"), "w") as f:
        json.dump(result, f, indent=1)
    errs = {k: result[k] for k in ("err_position", "err_radius", "err_albedo")}
    single_ok = (errs["err_position"] < 0.01 and errs["err_radius"] < 0.005
                 and errs["err_albedo"] < 0.01)

    # Multi-host sharded train step vs single-device, on a virtual 8-device
    # CPU mesh (subprocess; same witness as __graft_entry__.dryrun_multichip).
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('SHARDED_OK')"
    )
    try:
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=560,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        sharded_ok = "SHARDED_OK" in out.stdout
    except Exception:
        sharded_ok = False
    return {
        "name": "inverse-10sphere-multihost",
        "spec": "gradient recovery of 10-sphere scene (pos/radius/albedo) from 5-view seed-paired targets + sharded train step == single-device on 8-device virtual mesh",
        "passed": bool(single_ok and sharded_ok),
        "errors": {k: round(v, 5) for k, v in errs.items()},
        "sharded_train_step_ok": bool(sharded_ok),
        "wall_s": round(wall, 1),
    }


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "04"
    results = []
    for fn in (config1, config2, config3, config4, config5):
        t0 = time.perf_counter()
        try:
            r = fn()
        except Exception as e:  # pragma: no cover
            r = {"name": fn.__name__, "passed": False, "error": str(e)[:300]}
        r["config_wall_s"] = round(time.perf_counter() - t0, 1)
        results.append(r)
        print(json.dumps(r), flush=True)
    out = {
        "round": rnd,
        "device": str(jax.devices()[0]),
        "all_passed": all(r.get("passed") for r in results),
        "configs": results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"CONFIGS_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, "all_passed:", out["all_passed"])


if __name__ == "__main__":
    main()
