"""Fused full-frame forward kernel.

One Pallas pass computes, per row block, everything the reference's three
heavy fragment passes compute per pixel (geometry.frag + diffuse.frag +
specular.frag, minus the history gathers):

    raygen → primary intersect → analytic normal/curvature →
    dual-MIS shade (direct light + 4 plane roulettes, ~9 traces) →
    emission + primary material (albedo/energy)

HBM traffic is exactly the tiny scene tables in and 14 image planes out —
no G-buffer round trip, no seed image, no ray-dir image. Temporal
reprojection (a 2×2 history gather, common.glsl:661-694) and the composite
stay in XLA where a gather is one fused op.

All math is the component-plane style of ops/shade_kernel.py (which
provides the shade core); normals/curvature are the closed forms of
scene/normals.py. Forward-only: gradients route through the XLA pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kylespathtracer_tpu.core import gmath
from kylespathtracer_tpu.ops import shade_kernel as sk
from kylespathtracer_tpu.scene.types import Scene
from kylespathtracer_tpu.utils.config import RenderConfig


def _normal_curv(sc, counts, hl, ho):
    """Component-plane analytic normal + curvature (scene/normals.py)."""
    nP, nS, nB = counts
    zero = jnp.zeros_like(hl[0])
    n = [zero, zero, zero]
    c = zero

    for i in range(nP):
        sel = ho == sc["plane_ids"][i, 0]
        for k in range(3):
            n[k] = jnp.where(sel, sc["planes"][i, k], n[k])

    for i in range(nS):
        sel = ho == sc["sphere_ids"][i, 0]
        d = (
            hl[0] - sc["spheres"][i, 0],
            hl[1] - sc["spheres"][i, 1],
            hl[2] - sc["spheres"][i, 2],
        )
        inv = jax.lax.rsqrt(jnp.maximum(sk._dot(d, d), 1e-12))
        for k in range(3):
            n[k] = jnp.where(sel, d[k] * inv, n[k])
        c = jnp.where(sel, gmath.EPS * inv, c)

    for i in range(nB):
        sel = ho == sc["box_ids"][i, 0]
        q = (
            hl[0] - sc["boxes"][i, 0],
            hl[1] - sc["boxes"][i, 1],
            hl[2] - sc["boxes"][i, 2],
        )
        d = tuple(jnp.abs(q[k]) - sc["boxes"][i, 3 + k] for k in range(3))
        m = tuple(jnp.maximum(d[k], 0.0) for k in range(3))
        inv = jax.lax.rsqrt(jnp.maximum(sk._dot(m, m), 1e-12))
        kpos = sum((d[k] > 0.0).astype(hl[0].dtype) for k in range(3))
        for k in range(3):
            n[k] = jnp.where(sel, m[k] * jnp.sign(q[k]) * inv, n[k])
        c = jnp.where(sel, 0.5 * gmath.EPS * jnp.maximum(kpos - 1.0, 0.0) * inv, c)

    return tuple(n), c


def _frame_kernel(
    planes_ref, plane_ids_ref, spheres_ref, sphere_ids_ref, boxes_ref,
    box_ids_ref, light_color_ref, light_ref, light_id_ref,
    mat_s0_ref, mat_s1_ref, mat_freq_ref, mat_alb_const_ref,
    mat_alb_scale_ref, mat_emission_ref, mat_en_const_ref, mat_en_scale_ref,
    cam_ref, orient_ref, frame_ref,
    add_d_r, add_d_g, add_d_b, add_s_r, add_s_g, add_s_b,
    alb_r, alb_g, alb_b, ene_d, ene_s, depth_out, curv_out, oid_out,
    *, counts, nK, gloss, width, height, fov, block_rows,
):
    sc = {
        "planes": planes_ref,
        "plane_ids": plane_ids_ref,
        "spheres": spheres_ref,
        "sphere_ids": sphere_ids_ref,
        "boxes": boxes_ref,
        "box_ids": box_ids_ref,
        "light_color": light_color_ref,
        "light": light_ref,
        "light_id_arr": light_id_ref,
        "mat_s0": mat_s0_ref,
        "mat_s1": mat_s1_ref,
        "mat_freq": mat_freq_ref,
        "mat_alb_const": mat_alb_const_ref,
        "mat_alb_scale": mat_alb_scale_ref,
        "mat_emission": mat_emission_ref,
        "mat_en_const": mat_en_const_ref,
        "mat_en_scale": mat_en_scale_ref,
        "nK": nK,
    }
    shape = (block_rows, width)
    i = pl.program_id(0)

    # Pixel grid of this block. Row 0 is the image bottom (GL fragCoord).
    px = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    py = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * block_rows

    # Per-pixel Weyl seed (common.glsl:39-41), all int32 wraparound.
    frame = frame_ref[0, 0]
    seed = (
        ((frame << 12) + px + (py << 1))
        ^ (px * jnp.int32(height))
        ^ (py * jnp.int32(width))
    )

    # Raygen (geometry.frag:38-39,67): aspect-scaled NDC → normalize →
    # pitch/yaw rotation.
    asp = float(width) / float(height)
    xf = (2.0 * (px.astype(jnp.float32) + 0.5) / float(width) - 1.0) * asp
    yf = 2.0 * (py.astype(jnp.float32) + 0.5) / float(height) - 1.0
    zf = jnp.full(shape, float(fov), jnp.float32)
    inv = jax.lax.rsqrt(xf * xf + yf * yf + zf * zf)
    dx, dy, dz = xf * inv, yf * inv, zf * inv
    cx = jnp.cos(orient_ref[0, 0])
    sx = jnp.sin(orient_ref[0, 0])
    cy = jnp.cos(orient_ref[0, 1])
    sy = jnp.sin(orient_ref[0, 1])
    y2 = dy * cx + dz * sx
    z1 = -dy * sx + dz * cx
    rd = (dx * cy + z1 * sy, y2, -dx * sy + z1 * cy)

    cam = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
    ro = (
        jnp.full(shape, 0.0, jnp.float32) + cam[0],
        jnp.full(shape, 0.0, jnp.float32) + cam[1],
        jnp.full(shape, 0.0, jnp.float32) + cam[2],
    )

    # Primary intersect (geometry.frag:67-68) + analytic normal/curvature.
    no_excl = jnp.full(shape, -1, jnp.int32)
    t, oid = sk._trace(sc, ro, rd, no_excl, *counts)
    hit = oid > 0
    hl_n = (ro[0] + rd[0] * t, ro[1] + rd[1] * t, ro[2] + rd[2] * t)
    hn, curv = _normal_curv(sc, counts, hl_n, oid)
    hn = sk._where_v(hit, hn, (jnp.zeros_like(t),) * 3)

    # Shading point: one more eps back along the ray (geometry.frag:71
    # stores t-eps; the accumulation passes shade at that depth).
    depth = t - gmath.EPS
    hl = (ro[0] + rd[0] * depth, ro[1] + rd[1] * depth, ro[2] + rd[2] * depth)

    # Dual-MIS estimators (common.glsl:430-616).
    est_d, est_s = sk._shade_core(sc, counts, nK, gloss, hn, rd, oid, hl, seed)

    # Emission + primary material for reprojection add / composite
    # (diffuse.frag:54-56; passthrough.frag:39-41).
    alb, emi, ene = sk._surface(sc, oid, hl, nK)
    shade = (oid != sc["light_id_arr"][0, 0]) & hit

    add_d_r[:] = emi[0] + jnp.where(shade, est_d[0], 0.0)
    add_d_g[:] = emi[1] + jnp.where(shade, est_d[1], 0.0)
    add_d_b[:] = emi[2] + jnp.where(shade, est_d[2], 0.0)
    add_s_r[:] = emi[0] + jnp.where(shade, est_s[0], 0.0)
    add_s_g[:] = emi[1] + jnp.where(shade, est_s[1], 0.0)
    add_s_b[:] = emi[2] + jnp.where(shade, est_s[2], 0.0)
    alb_r[:] = alb[0]
    alb_g[:] = alb[1]
    alb_b[:] = alb[2]
    ene_d[:] = ene[0]
    ene_s[:] = ene[1]
    depth_out[:] = depth
    curv_out[:] = curv
    oid_out[:] = oid


def frame_forward_pallas(
    scene: Scene,
    camera,
    frame: jnp.ndarray,
    config: RenderConfig,
    block_rows: int | None = None,
    interpret: bool = False,
):
    """Run the fused forward kernel → dict of full-frame planes.

    Returns {"add_d","add_s","alb": f32[H,W,3]; "ene": f32[H,W,2];
    "depth","curv": f32[H,W]; "oid": i32[H,W]}.
    """
    H, W = config.height, config.width
    if block_rows is None:
        # Keep one (block_rows, W) f32 plane at ≲64 KB so the many live
        # planes of the shade core fit VMEM; at least 8 sublanes.
        block_rows = max(8, min(32, 65536 // (W * 4)))
    Hp = -(-H // block_rows) * block_rows

    counts = (
        int(scene.planes.shape[0]),
        int(scene.spheres.shape[0]),
        int(scene.boxes.shape[0]),
    )
    nK = int(scene.materials.s0.shape[0])

    kernel = functools.partial(
        _frame_kernel,
        counts=counts,
        nK=nK,
        gloss=config.gloss,
        width=W,
        height=H,
        fov=config.fov,
        block_rows=block_rows,
    )

    small = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    img = lambda: pl.BlockSpec(
        (block_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    mats = scene.materials
    col = lambda a: a.reshape(-1, 1)
    row = lambda a: a.reshape(1, -1)
    light_id = scene.sphere_ids[scene.light_index].reshape(1, 1)

    f32 = jax.ShapeDtypeStruct((Hp, W), jnp.float32)
    i32 = jax.ShapeDtypeStruct((Hp, W), jnp.int32)

    outs = pl.pallas_call(
        kernel,
        grid=(Hp // block_rows,),
        in_specs=[small() for _ in range(20)],
        out_specs=[img() for _ in range(14)],
        out_shape=[f32] * 13 + [i32],
        interpret=interpret,
    )(
        scene.planes, col(scene.plane_ids), scene.spheres,
        col(scene.sphere_ids), scene.boxes, col(scene.box_ids),
        row(scene.light_color), row(scene.light), light_id,
        col(mats.s0), col(mats.s1), col(mats.freq), mats.alb_const,
        mats.alb_scale, mats.emission, mats.en_const, mats.en_scale,
        row(camera.loc), row(camera.orient),
        jnp.asarray(frame, jnp.int32).reshape(1, 1),
    )
    crop = lambda a: a[:H]
    return {
        "add_d": jnp.stack([crop(o) for o in outs[0:3]], axis=-1),
        "add_s": jnp.stack([crop(o) for o in outs[3:6]], axis=-1),
        "alb": jnp.stack([crop(o) for o in outs[6:9]], axis=-1),
        "ene": jnp.stack([crop(o) for o in outs[9:11]], axis=-1),
        "depth": crop(outs[11]),
        "curv": crop(outs[12]),
        "oid": crop(outs[13]),
    }
