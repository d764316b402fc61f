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
scene/normals.py. The full quality config runs in-kernel: smp_* loops,
BIASED on (dual-MIS) or off (the unbiased ground-truth estimators,
common.glsl:394-415). Gradients: ops/frame_grad.py wraps this forward in a
custom VJP with a recompute backward kernel.
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


# Ordered names of the kernel's 20 small operands; the first block builds
# the `sc` dict, the last three are camera loc / orient / frame index.
SC_KEYS = (
    "planes", "plane_ids", "spheres", "sphere_ids", "boxes", "box_ids",
    "light_color", "light", "light_id_arr", "mat_s0", "mat_s1", "mat_freq",
    "mat_alb_const", "mat_alb_scale", "mat_emission", "mat_en_const",
    "mat_en_scale",
)


def smp_of(config: RenderConfig) -> int:
    """The fused kernel's per-strategy sample count from the six SMP_*
    knobs (common.glsl:13-24). The kernel shares every cone draw across
    strategies (like mis.dual_mis), which requires the six counts equal;
    any other combination must use pipeline="pass"."""
    smp = config.smp_direct_lambert
    if not (
        smp == config.smp_lambert_surface_lambert
        == config.smp_lambert_surface_phong == config.smp_direct_phong
        == config.smp_phong_surface_lambert == config.smp_phong_surface_phong
    ) or smp < 1:
        raise ValueError(
            "the fused pipeline requires all six smp_* counts equal and >=1 "
            f"(got {smp}, {config.smp_lambert_surface_lambert}, "
            f"{config.smp_lambert_surface_phong}, {config.smp_direct_phong}, "
            f"{config.smp_phong_surface_lambert}, "
            f"{config.smp_phong_surface_phong}); use pipeline='pass' for "
            "per-strategy counts"
        )
    return int(smp)


def _fold_seed(seed, i: int, decorrelate: bool):
    """Per-sample stream in component form (core/sampler.fold_seed):
    `seed + i` Weyl-lattice stride by default, PCG-hashed (seed, i) when
    decorrelating."""
    if not decorrelate or i == 0:
        return seed + jnp.int32(i)
    mixed = seed.astype(jnp.uint32) ^ jnp.uint32((i * 0x9E3779B9) & 0xFFFFFFFF)
    state = mixed * jnp.uint32(747796405) + jnp.uint32(2891336453)
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((state >> shift) ^ state) * jnp.uint32(277803737)
    return ((word >> jnp.uint32(22)) ^ word).astype(jnp.int32)


def _raygen(shape, cam, orient, width, height, fov, row0, col0=0):
    """Pixel grid + primary rays for a block (geometry.frag:38-39,67):
    aspect-scaled NDC → normalize → pitch/yaw rotation. Returns
    (px, py, ro, rd) component planes."""
    px = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0
    py = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    asp = float(width) / float(height)
    xf = (2.0 * (px.astype(jnp.float32) + 0.5) / float(width) - 1.0) * asp
    yf = 2.0 * (py.astype(jnp.float32) + 0.5) / float(height) - 1.0
    zf = jnp.full(shape, float(fov), jnp.float32)
    inv = jax.lax.rsqrt(xf * xf + yf * yf + zf * zf)
    dx, dy, dz = xf * inv, yf * inv, zf * inv
    cx = jnp.cos(orient[0, 0])
    sx = jnp.sin(orient[0, 0])
    cy = jnp.cos(orient[0, 1])
    sy = jnp.sin(orient[0, 1])
    y2 = dy * cx + dz * sx
    z1 = -dy * sx + dz * cx
    rd = (dx * cy + z1 * sy, y2, -dx * sy + z1 * cy)
    ro = (
        jnp.full(shape, 0.0, jnp.float32) + cam[0, 0],
        jnp.full(shape, 0.0, jnp.float32) + cam[0, 1],
        jnp.full(shape, 0.0, jnp.float32) + cam[0, 2],
    )
    return px, py, ro, rd


def frame_block(
    sc, cam, orient, frame, row0,
    *, counts, nK, gloss, width, height, fov, block_rows, soft_beta=0.0,
    block_cols=None, col0=0, smp=1, decorrelate=False, biased=True,
):
    """The fused frame's per-block math as a pure function of VALUES.

    sc: dict of SC_KEYS → arrays (kernel operand shapes); cam f32[1,3];
    orient f32[1,2]; frame i32 scalar; row0/col0 i32 scalars (first image
    row/col of the block). Returns the 14 planes, 13 f32 + oid i32, each
    (block_rows, block_cols or width).

    Shared three ways: the forward kernel wraps it over refs (full-width
    blocks); the backward kernel (ops/frame_grad.py) `jax.vjp`s it per 2-D
    block; tests call it as plain jnp to check the math without Pallas
    interpret overhead.
    """
    sc = dict(sc)
    sc["nK"] = nK
    shape = (block_rows, width if block_cols is None else block_cols)

    # Pixel grid of this block. Row 0 is the image bottom (GL fragCoord).
    px, py, ro, rd = _raygen(shape, cam, orient, width, height, fov, row0, col0)

    # Per-pixel Weyl seed (common.glsl:39-41), all int32 wraparound.
    seed = (
        ((frame << 12) + px + (py << 1))
        ^ (px * jnp.int32(height))
        ^ (py * jnp.int32(width))
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

    if biased:
        # Dual-MIS estimators (common.glsl:430-616), averaged over the smp
        # per-strategy samples exactly like mis.dual_mis: per-sample streams
        # via _fold_seed, statically unrolled so each iteration's
        # intermediates die before the next.
        est_d = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
        est_s = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
        for i in range(smp):
            ed, es = sk._shade_core(
                sc, counts, nK, gloss, hn, rd, oid, hl,
                _fold_seed(seed, i, decorrelate), soft_beta=soft_beta,
            )
            for c in range(3):
                est_d[c] = est_d[c] + ed[c]
                est_s[c] = est_s[c] + es[c]
        if smp > 1:
            inv_smp = 1.0 / float(smp)
            est_d = [e * inv_smp for e in est_d]
            est_s = [e * inv_smp for e in est_s]
    else:
        # Unbiased ground-truth mode (BIASED off, common.glsl:394-415).
        est_d, est_s = sk._shade_core_unbiased(
            sc, counts, gloss, hn, rd, oid, hl, seed, smp, decorrelate
        )

    # Emission + primary material for reprojection add / composite
    # (diffuse.frag:54-56; passthrough.frag:39-41).
    alb, emi, ene = sk._surface(sc, oid, hl, nK)
    shade = (oid != sc["light_id_arr"][0, 0]) & hit

    return (
        emi[0] + jnp.where(shade, est_d[0], 0.0),
        emi[1] + jnp.where(shade, est_d[1], 0.0),
        emi[2] + jnp.where(shade, est_d[2], 0.0),
        emi[0] + jnp.where(shade, est_s[0], 0.0),
        emi[1] + jnp.where(shade, est_s[1], 0.0),
        emi[2] + jnp.where(shade, est_s[2], 0.0),
        alb[0], alb[1], alb[2], ene[0], ene[1], depth, curv, oid,
    )


def _frame_kernel(
    *refs,
    counts, nK, gloss, width, height, fov, block_rows, soft_beta, smp,
    decorrelate, biased, block_cols=None,
):
    in_refs, out_refs = refs[:21], refs[21:]
    # Refs go into frame_block directly: scalar reads like planes_ref[i, k]
    # stay scalar-register loads. Materializing the tables with ref[:] first
    # turns every scene scalar into a vector extract + lane broadcast, which
    # costs ~1.8 MB of VMEM at 1080p — over the scoped-vmem cliff.
    sc = dict(zip(SC_KEYS, in_refs[:17]))
    cam_ref, orient_ref, frame_ref, row0_ref = in_refs[17:]
    i = pl.program_id(0)
    col0 = 0 if block_cols is None else pl.program_id(1) * block_cols
    outs = frame_block(
        sc, cam_ref, orient_ref, frame_ref[0, 0],
        row0_ref[0, 0] + i * block_rows,
        counts=counts, nK=nK, gloss=gloss, width=width, height=height,
        fov=fov, block_rows=block_rows, soft_beta=soft_beta, smp=smp,
        decorrelate=decorrelate, biased=biased,
        block_cols=block_cols, col0=col0,
    )
    for ref, val in zip(out_refs, outs):
        ref[:] = val


def small_operands(scene: Scene, camera, frame):
    """The 20 small kernel operands (SC_KEYS order + cam, orient, frame).

    Zero-row geometry tables (a scene with no boxes/planes) are padded to
    one dummy row — Mosaic rejects 0-sized operands, and the static counts
    mean the kernel never reads them. ops/frame_grad crops the matching
    gradients back."""
    mats = scene.materials

    def pad1(a):
        if a.shape[0]:
            return a
        return jnp.zeros((1,) + a.shape[1:], a.dtype)

    col = lambda a: pad1(a.reshape(-1, 1))
    row = lambda a: a.reshape(1, -1)
    light_id = scene.sphere_ids[scene.light_index].reshape(1, 1)
    return (
        pad1(scene.planes), col(scene.plane_ids), pad1(scene.spheres),
        col(scene.sphere_ids), pad1(scene.boxes), col(scene.box_ids),
        row(scene.light_color), row(scene.light), light_id,
        col(mats.s0), col(mats.s1), col(mats.freq), mats.alb_const,
        mats.alb_scale, mats.emission, mats.en_const, mats.en_scale,
        row(camera.loc), row(camera.orient),
        jnp.asarray(frame, jnp.int32).reshape(1, 1),
    )


def frame_forward_pallas(
    scene: Scene,
    camera,
    frame: jnp.ndarray,
    config: RenderConfig,
    block_rows: int | None = None,
    interpret: bool = False,
    row_base: int = 0,
    rows: int | None = None,
    block_cols: int | None = None,
):
    """Run the fused forward kernel → dict of full-frame planes.

    Returns {"add_d","add_s","alb": f32[H,W,3]; "ene": f32[H,W,2];
    "depth","curv": f32[H,W]; "oid": i32[H,W]}.

    `row_base`/`rows` restrict the render to image rows
    [row_base, row_base+rows) — the per-device tile of the sharded renderer
    (parallel/shard.py). The NDC mapping, seeds, and ray grid stay those of
    the FULL config.height image, so the tiles are bitwise the matching
    rows of the unsharded frame.

    `block_cols` splits the grid along columns too ((block_rows,
    block_cols) blocks like the backward kernel). Swept round 5 at 1080p
    (scan-slope): (8,640) 4.16 ms < (8,512) 4.41 < (8,1024) 4.61 <
    full-width (8,1920) 4.89 < (8,256) 4.90 — narrower blocks ease vector-
    register pressure in the shade core until grid overhead wins below
    ~384; non-divisors of W (768/896) lose to padding waste. Default None
    auto-selects 640 when it divides W (else full width); pass
    block_cols=config.width to force full-width blocks.
    """
    H, W = (rows if rows is not None else config.height), config.width
    if block_rows is None:
        # Keep one (block_rows, W) f32 plane at ≲64 KB so the many live
        # planes of the shade core fit VMEM; at least 8 sublanes.
        # Multiple of 8 (sublane tiling): 65536//(1280*4)=12 would violate
        # the Mosaic block-shape constraint at 720p.
        block_rows = max(8, min(32, (65536 // (W * 4)) & ~7))
        if rows is not None:
            # Tile mode: never shade more rows than the tile has (a
            # 32-row default against an 8-row tile would compute 4x the
            # tile's work and crop it).
            block_rows = min(block_rows, max(8, rows & ~7))
    if block_cols is None and W % 640 == 0 and W > 640:
        block_cols = 640
    if block_cols == W:
        block_cols = None  # full width uses the cheaper 1-D grid
    Hp = -(-H // block_rows) * block_rows
    bc = W if block_cols is None else block_cols
    Wp = -(-W // bc) * bc

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
        height=config.height,  # full-image NDC/seed mapping, even for tiles
        fov=config.fov,
        block_rows=block_rows,
        soft_beta=float(config.soft_shadows),
        smp=smp_of(config),
        decorrelate=bool(config.decorrelate_samples),
        biased=bool(config.biased),
        block_cols=block_cols,
    )

    small = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    if block_cols is None:
        grid = (Hp // block_rows,)
        img = lambda: pl.BlockSpec(
            (block_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    else:
        grid = (Hp // block_rows, Wp // bc)
        img = lambda: pl.BlockSpec(
            (block_rows, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM
        )

    f32 = jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
    i32 = jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[small() for _ in range(21)],
        out_specs=[img() for _ in range(14)],
        out_shape=[f32] * 13 + [i32],
        # The shade core keeps many live full-width planes per block; the
        # conservative default 16 MB scoped-vmem cap is too tight at 1080p.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        *small_operands(scene, camera, frame),
        jnp.asarray(row_base, jnp.int32).reshape(1, 1),
    )
    if Wp != W:
        outs = [o[:, :W] for o in outs]
    return assemble_planes(outs, H)


def assemble_planes(outs, H):
    """14 (Hp, W) planes → the frame dict, rows cropped to H."""
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


def _geometry_kernel(
    *refs, counts, width, height, fov, block_rows, block_cols=None,
):
    """Raygen + primary nearest-hit + analytic normal/curvature only — the
    reference's geometry pass (geometry.frag:36-72) as a standalone kernel.
    Outputs: depth, curv, nx, ny, nz (f32) + oid (i32)."""
    in_refs, out_refs = refs[:20], refs[20:]
    sc = dict(zip(SC_KEYS, in_refs[:17]))
    cam_ref, orient_ref, _frame_ref = in_refs[17:]
    bc = width if block_cols is None else block_cols
    shape = (block_rows, bc)
    i = pl.program_id(0)
    col0 = 0 if block_cols is None else pl.program_id(1) * block_cols

    px, py, ro, rd = _raygen(
        shape, cam_ref, orient_ref, width, height, fov, i * block_rows, col0
    )
    no_excl = jnp.full(shape, -1, jnp.int32)
    t, oid = sk._trace(sc, ro, rd, no_excl, *counts)
    hit = oid > 0
    hl = (ro[0] + rd[0] * t, ro[1] + rd[1] * t, ro[2] + rd[2] * t)
    hn, curv = _normal_curv(sc, counts, hl, oid)
    hn = sk._where_v(hit, hn, (jnp.zeros_like(t),) * 3)

    for ref, val in zip(
        out_refs, (t - gmath.EPS, curv, hn[0], hn[1], hn[2], oid)
    ):
        ref[:] = val


def geometry_pass_pallas(
    scene: Scene,
    camera,
    frame,
    config: RenderConfig,
    block_rows: int = 16,
    interpret: bool = False,
    block_cols: int | None = None,
):
    """Primary-visibility raycast → dict(depth, curv, normal, oid): the
    geometry pass alone, for the raw rays/s benchmark and G-buffer-only
    uses. Round-5 block sweep at 1080p (v5e, scan-slope): (16,640)
    0.57 ms = 3.6 Grays/s < (32,640) 0.63 < (32,full) 0.86 — like the
    shade kernel, column blocks beat full-width rows; 640 auto-selects
    when it divides the width (pass block_cols=config.width to force
    full-width). The round-3 single-dispatch figures were host-rtt-bound
    and unreliable below ~10 ms."""
    H, W = config.height, config.width
    if block_cols is None and W % 640 == 0 and W > 640:
        block_cols = 640
    if block_cols == W:
        block_cols = None
    Hp = -(-H // block_rows) * block_rows
    bc = W if block_cols is None else block_cols
    Wp = -(-W // bc) * bc
    counts = (
        int(scene.planes.shape[0]),
        int(scene.spheres.shape[0]),
        int(scene.boxes.shape[0]),
    )
    kernel = functools.partial(
        _geometry_kernel,
        counts=counts, width=W, height=H, fov=config.fov,
        block_rows=block_rows, block_cols=block_cols,
    )
    small = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    if block_cols is None:
        grid = (Hp // block_rows,)
        img = lambda: pl.BlockSpec(
            (block_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    else:
        grid = (Hp // block_rows, Wp // bc)
        img = lambda: pl.BlockSpec(
            (block_rows, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM
        )
    f32 = jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
    i32 = jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[small() for _ in range(20)],
        out_specs=[img() for _ in range(6)],
        out_shape=[f32] * 5 + [i32],
        interpret=interpret,
    )(*small_operands(scene, camera, frame))
    if Wp != W:
        outs = [o[:, :W] for o in outs]
    crop = lambda a: a[:H]
    return {
        "depth": crop(outs[0]),
        "curv": crop(outs[1]),
        "normal": jnp.stack([crop(o) for o in outs[2:5]], axis=-1),
        "oid": crop(outs[5]),
    }


def frame_forward_jnp(scene: Scene, camera, frame, config: RenderConfig):
    """`frame_block` over the whole image as plain jnp — the fused kernel's
    math without Pallas. Test oracle (no interpret-mode overhead) and the
    gradient reference the backward kernel is checked against."""
    H, W = config.height, config.width
    ops = small_operands(scene, camera, frame)
    sc = dict(zip(SC_KEYS, ops[:17]))
    counts = (
        int(scene.planes.shape[0]),
        int(scene.spheres.shape[0]),
        int(scene.boxes.shape[0]),
    )
    outs = frame_block(
        sc, ops[17], ops[18], ops[19][0, 0], jnp.int32(0),
        counts=counts, nK=int(scene.materials.s0.shape[0]),
        gloss=config.gloss, width=W, height=H, fov=config.fov,
        block_rows=H, soft_beta=float(config.soft_shadows),
        smp=smp_of(config), decorrelate=bool(config.decorrelate_samples),
        biased=bool(config.biased),
    )
    return assemble_planes(outs, H)
