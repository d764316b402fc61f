"""Fully fused temporal frame: shade + reprojection + accumulate in ONE
Pallas kernel (config.temporal_fusion="mono").

Round 3 ran the fused frame as three device programs — the shade kernel
(ops/frame_kernel.py), the windowed-reprojection kernel
(ops/reproject_kernel.py, two launches), and an XLA tail (anchor math,
floor, velocity clamp, accumulate) — paying ~3.5 ms of the 12.7 ms frame in
reprojection launches and HBM round trips of 20+ full-resolution planes;
round 4 fused everything into this kernel (7.7 ms). Round 5 found the
pendulum's true center: with the shade kernel on (8,640) column blocks and
the liveness-skipping select shared back into the standalone reprojection
kernel, the SPLIT composition (render/pipeline.py temporal_fusion="split")
runs 5.8 ms — the monolith's register pressure costs more than its saved
launches — so this kernel is now the single-launch option rather than the
default. It computes the whole history-path frame in one pass per row
block:

    raygen → intersect → normals → dual-MIS shade        (frame_block)
    → hit point + curvature-pushed specular anchor        (specular.frag:45-49)
    → previous-camera projection + bounded-window select  (common.glsl:661-694)
    → floor(count) + velocity-adaptive temporal clamp     (diffuse.frag:49-51)
    → history accumulate (rgb + estimator, count + 1)

HBM traffic: the tiny scene tables + 10 history planes in (each row block
plus its ±1-block halo via shifted BlockSpecs), 14 planes out. The XLA side
keeps only the composite (measured free — it fuses into the output
consumers). Forward-only, like the windowed reprojection it absorbs: the
differentiable path is the no_history single-frame kernel
(ops/frame_grad.py).

Numerics match the unfused chain to float-association ulps; the only
behavioral boundary is inherited from ops/reproject_kernel.py: taps beyond
`config.reproject_window` rows/cols restart the history (the velocity clamp
already collapses history under fast motion, so the bound is free in
practice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kylespathtracer_tpu.core import gmath
from kylespathtracer_tpu.ops import frame_kernel as fk
from kylespathtracer_tpu.ops import shade_kernel as sk
from kylespathtracer_tpu.scene.types import Scene
from kylespathtracer_tpu.utils.config import RenderConfig


def _prev_basis(prev_orient):
    """Previous camera basis as scalars (render/reproject.reproject_query;
    common.glsl:663-665). lf = rotate_xy((0,0,1), prev_orient);
    r = normalize(cross(lf, up)) = (-lf_z, 0, lf_x)/|..|; u = normalize(
    cross(lf, r))."""
    px_, py_ = prev_orient[0, 0], prev_orient[0, 1]
    cx, sx = jnp.cos(px_), jnp.sin(px_)
    cy, sy = jnp.cos(py_), jnp.sin(py_)
    lf = (cx * sy, sx, cx * cy)
    rlen = jax.lax.rsqrt(jnp.maximum(lf[0] * lf[0] + lf[2] * lf[2], 1e-20))
    r = (-lf[2] * rlen, jnp.float32(0.0), lf[0] * rlen)
    # cross(lf, r)
    u = (
        lf[1] * r[2] - lf[2] * r[1],
        lf[2] * r[0] - lf[0] * r[2],
        lf[0] * r[1] - lf[1] * r[0],
    )
    ulen = jax.lax.rsqrt(jnp.maximum(sk._dot(u, u), 1e-20))
    u = sk._scale(u, ulen)
    return lf, r, u


def _queries_block(anchor, prev_loc, basis, py, px, width, height, fov):
    """Component form of ops/reproject_kernel._queries for one block:
    project the anchor into the previous camera → (dyrel, dxrel, w4)."""
    lf, r, u = basis
    asp = float(width) / float(height)
    nhl = (
        prev_loc[0, 0] - anchor[0],
        prev_loc[0, 1] - anchor[1],
        prev_loc[0, 2] - anchor[2],
    )
    nhl = sk._normalize(nhl)
    denom = sk._dot(nhl, lf)
    denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    inv_den = float(fov) / denom
    luv_x = sk._dot(nhl, r) * inv_den * (1.0 / asp)
    luv_y = sk._dot(nhl, u) * inv_den
    inside = (
        (luv_x <= 1.0) & (luv_x >= -1.0) & (luv_y <= 1.0) & (luv_y >= -1.0)
    )

    fu = (luv_x * -0.5 + 0.5) * float(width) - 0.5
    fv = (luv_y * -0.5 + 0.5) * float(height) - 0.5
    iu = jnp.trunc(fu).astype(jnp.int32)
    iv = jnp.trunc(fv).astype(jnp.int32)
    du = fu - iu.astype(jnp.float32)
    dv = fv - iv.astype(jnp.float32)

    dyrel = iv - py
    dxrel = iu - px
    wy0 = jnp.where((iv >= 0) & (iv < height), 1.0 - dv, 0.0)
    wy1 = jnp.where((iv + 1 >= 0) & (iv + 1 < height), dv, 0.0)
    wx0 = jnp.where((iu >= 0) & (iu < width) & inside, 1.0 - du, 0.0)
    wx1 = jnp.where((iu + 1 >= 0) & (iu + 1 < width) & inside, du, 0.0)
    return dyrel, dxrel, (wy0, wy1, wx0, wx1)


def _temporal_clamp_block(rgb, cnt, vv, temporal):
    """Velocity-adaptive history clamp in component form
    (render/passes._temporal_clamp; diffuse.frag:49-51)."""
    T = float(temporal)
    lvv = jnp.minimum(T - 1.0, jnp.floor(T * 2.0 * jnp.sqrt(vv)))
    limit = T - lvv
    over = cnt > limit
    scale = jnp.where(over, limit / jnp.maximum(cnt, 1e-6), 1.0)
    return [c * scale for c in rgb], jnp.where(over, limit, cnt)


# The liveness-skipping bounded-window select lives in
# ops/reproject_kernel (shared with the standalone reprojection kernel).
from kylespathtracer_tpu.ops.reproject_kernel import _set_kernel_dyn


def _frame_hist_kernel(
    *refs,
    counts, nK, gloss, width, height, fov, block_rows, soft_beta, smp,
    decorrelate, biased, K, temporal,
):
    in_refs = refs[:53]
    out_refs = refs[53:67]
    acc_refs = refs[67:71]
    sc = dict(zip(fk.SC_KEYS, in_refs[:17]))
    cam_ref, orient_ref, frame_ref, prev_loc, prev_orient, row_base = (
        in_refs[17:23]
    )
    hist_refs = in_refs[23:53]  # (below,cur,above) x 5 planes x 2 sets
    i = pl.program_id(0)
    row0 = row_base[0, 0] + i * block_rows
    shape = (block_rows, width)

    outs = fk.frame_block(
        sc, cam_ref, orient_ref, frame_ref[0, 0], row0,
        counts=counts, nK=nK, gloss=gloss, width=width, height=height,
        fov=fov, block_rows=block_rows, soft_beta=soft_beta, smp=smp,
        decorrelate=decorrelate, biased=biased,
    )
    add_d = outs[0:3]
    add_s = outs[3:6]
    alb = outs[6:9]
    ene = outs[9:11]
    depth, curv, oid = outs[11], outs[12], outs[13]

    # Anchors: hit point for diffuse, curvature-pushed virtual-image point
    # for specular (specular.frag:45-49; render/pipeline.py fused path).
    px, py, ro, rd = fk._raygen(
        shape, cam_ref, orient_ref, width, height, fov, row0
    )
    hl = (ro[0] + rd[0] * depth, ro[1] + rd[1] * depth, ro[2] + rd[2] * depth)
    lv = (
        hl[0] - sc["light"][0, 0],
        hl[1] - sc["light"][0, 1],
        hl[2] - sc["light"][0, 2],
    )
    light_dist = jnp.sqrt(jnp.maximum(sk._dot(lv, lv), 1e-20))
    fac = gmath.EPS / jnp.sqrt(jnp.maximum(gmath.EPS, curv))
    push = light_dist * fac
    sl = (hl[0] + rd[0] * push, hl[1] + rd[1] * push, hl[2] + rd[2] * push)

    # Camera speed (scalar): vv = |cam - prev_loc| (decodeAll's `vv`).
    dvx = cam_ref[0, 0] - prev_loc[0, 0]
    dvy = cam_ref[0, 1] - prev_loc[0, 1]
    dvz = cam_ref[0, 2] - prev_loc[0, 2]
    vv = jnp.sqrt(jnp.maximum(dvx * dvx + dvy * dvy + dvz * dvz, 0.0))

    basis = _prev_basis(prev_orient)
    hof = oid.astype(jnp.float32)

    def one_set(planes15, anchor, add):
        dyrel, dxrel, w4 = _queries_block(
            anchor, prev_loc, basis, py, px, width, height, fov
        )
        for c in range(4):
            acc_refs[c][:] = jnp.zeros(shape, jnp.float32)
        _set_kernel_dyn(
            planes15, hof, dyrel, dxrel, w4, block_rows, K, acc_refs
        )
        acc = [acc_refs[c][:] for c in range(4)]
        # floor(cnt + 1e-4): counts are integers whenever the 2x2 taps agree.
        # The reference's nested-mix bilinear keeps them exact (mix(c,c,t)=c,
        # passthrough.frag:44); the separable-weight form sums (1-d)+d per
        # axis, which can round to 0.99999994 and floor an exact count DOWN,
        # silently restarting the history on knife-edge pixels. The eps
        # restores integer counts; genuinely fractional counts (partial tap
        # coverage) are unaffected at 1e-4.
        rep_rgb, rep_cnt = acc[0:3], jnp.floor(acc[3] + 1e-4)
        rep_rgb, rep_cnt = _temporal_clamp_block(rep_rgb, rep_cnt, vv, temporal)
        return [rep_rgb[c] + add[c] for c in range(3)], rep_cnt + 1.0

    d_rgb, d_cnt = one_set(hist_refs[0:15], hl, add_d)
    s_rgb, s_cnt = one_set(hist_refs[15:30], sl, add_s)

    for ref, val in zip(
        out_refs,
        (*d_rgb, d_cnt, *s_rgb, s_cnt, *alb, *ene, oid),
    ):
        ref[:] = val


def frame_hist_pallas(
    scene: Scene,
    camera,
    prev_camera,
    history_d,  # Channel
    history_s,  # Channel
    frame,
    config: RenderConfig,
    block_rows: int | None = None,
    interpret: bool = False,
    row_base=0,
    rows: int | None = None,
    hist_halo: int = 0,
):
    """One fused temporal frame → (d_rgb, d_cnt, s_rgb, s_cnt, alb, ene,
    oid), rgb/alb stacked [...,3], ene [...,2].

    Full-frame by default. `row_base`/`rows`/`hist_halo` select TILE mode —
    the per-device row block of the sharded renderer (parallel/shard.py):
    the kernel renders image rows [row_base, row_base+rows) (row_base may be
    traced, e.g. axis_index*rows), and the history channels are a row
    WINDOW of shape (rows + 2*hist_halo, W) whose first row is global image
    row row_base - hist_halo — exactly what the ppermute halo exchange
    produces. Both `rows` and `hist_halo` must be multiples of block_rows
    so the shifted halo BlockSpecs stay block-aligned, and hist_halo must
    be >= the reprojection window K (taps never reach further than K rows
    by construction, so the one-block halo suffices)."""
    H, W = config.height, config.width
    tile = rows is not None
    R = rows if tile else H
    if block_rows is None:
        # Multiple of 8 (sublane tiling): 65536//(1280*4)=12 would violate
        # the Mosaic block-shape constraint at 720p.
        block_rows = max(8, min(32, (65536 // (W * 4)) & ~7))
        if tile:
            block_rows = min(block_rows, R)
    if config.reproject_window > block_rows:
        import warnings

        warnings.warn(
            f"reproject window={config.reproject_window} exceeds the fused "
            f"temporal kernel's one-block halo (block_rows={block_rows}); "
            f"clamping to {block_rows}. Taps beyond it restart the history.",
            stacklevel=2,
        )
    K = min(config.reproject_window, block_rows)
    if tile:
        if R % block_rows or hist_halo % block_rows:
            raise ValueError(
                f"tile mode needs rows ({R}) and hist_halo ({hist_halo}) "
                f"divisible by block_rows ({block_rows})"
            )
        if hist_halo < K:
            # hist_halo == 0 is the WORST case, not an exemption: the
            # below/above BlockSpecs would clamp inside the tile and
            # cross-tile taps would silently read the wrong history rows.
            raise ValueError(
                f"hist_halo ({hist_halo}) < reprojection window K ({K}): "
                "cross-tile taps would silently read wrong history rows"
            )
        nb = R // block_rows
        hb = hist_halo // block_rows
        pad = 0
    else:
        nb = -(-H // block_rows)
        hb = 0
        pad = nb * block_rows - H
    # Number of blocks in each history plane (what the shifted index maps
    # clamp against): padded full frame, or tile + halos.
    wb = nb + 2 * hb

    def pad_rows(a):
        if pad == 0:
            return a
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    counts = (
        int(scene.planes.shape[0]),
        int(scene.spheres.shape[0]),
        int(scene.boxes.shape[0]),
    )
    nK = int(scene.materials.s0.shape[0])

    kernel = functools.partial(
        _frame_hist_kernel,
        counts=counts, nK=nK, gloss=config.gloss, width=W, height=H,
        fov=config.fov, block_rows=block_rows,
        soft_beta=float(config.soft_shadows), smp=fk.smp_of(config),
        decorrelate=bool(config.decorrelate_samples),
        biased=bool(config.biased), K=K,
        temporal=float(config.temporal),
    )

    small = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    img = lambda: pl.BlockSpec(
        (block_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # History maps are offset by the halo blocks (hb=0 full frame): grid
    # block i's "cur" history block covers the same global rows as its
    # output block; edge clamps only bind in full-frame mode, where
    # out-of-image taps carry zero weight anyway.
    cur = lambda: pl.BlockSpec(
        (block_rows, W), lambda i: (i + hb, 0), memory_space=pltpu.VMEM
    )
    below = lambda: pl.BlockSpec(
        (block_rows, W), lambda i: (jnp.maximum(i + hb - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    above = lambda: pl.BlockSpec(
        (block_rows, W), lambda i: (jnp.minimum(i + hb + 1, wb - 1), 0),
        memory_space=pltpu.VMEM,
    )

    def hist_planes(ch):
        idf = ch.oid.astype(jnp.float32)
        return [
            pad_rows(ch.rgb[..., 0]), pad_rows(ch.rgb[..., 1]),
            pad_rows(ch.rgb[..., 2]), pad_rows(ch.cnt), pad_rows(idf),
        ]

    hist_d = hist_planes(history_d)
    hist_s = hist_planes(history_s)
    hist_specs = (
        [below() for _ in range(5)] + [cur() for _ in range(5)]
        + [above() for _ in range(5)]
    )

    Rp = nb * block_rows
    f32 = jax.ShapeDtypeStruct((Rp, W), jnp.float32)
    i32 = jax.ShapeDtypeStruct((Rp, W), jnp.int32)

    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[small() for _ in range(23)] + hist_specs + hist_specs,
        out_specs=[img() for _ in range(14)],
        out_shape=[f32] * 13 + [i32],
        scratch_shapes=[
            pltpu.VMEM((block_rows, W), jnp.float32) for _ in range(4)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        *fk.small_operands(scene, camera, frame),
        prev_camera.loc.reshape(1, 3), prev_camera.orient.reshape(1, 2),
        jnp.asarray(row_base, jnp.int32).reshape(1, 1),
        *hist_d, *hist_d, *hist_d,
        *hist_s, *hist_s, *hist_s,
    )
    crop = lambda a: a[:R]
    return {
        "d_rgb": jnp.stack([crop(o) for o in outs[0:3]], axis=-1),
        "d_cnt": crop(outs[3]),
        "s_rgb": jnp.stack([crop(o) for o in outs[4:7]], axis=-1),
        "s_cnt": crop(outs[7]),
        "alb": jnp.stack([crop(o) for o in outs[8:11]], axis=-1),
        "ene": jnp.stack([crop(o) for o in outs[11:13]], axis=-1),
        "oid": crop(outs[13]),
    }
