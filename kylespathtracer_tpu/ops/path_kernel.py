"""Fused multi-bounce path-trace kernel (the wavefront integrator in VMEM).

The XLA wavefront integrator (render/wavefront.py) is correctness-complete
but bandwidth-bound: every op in the `lax.scan` bounce body materializes
full [H, W] intermediates, and the per-id table gathers break XLA's
fusion, so each path segment round-trips HBM many times (~63 Mseg/s at
1080p). This kernel runs the ENTIRE path — raygen, every bounce's
intersect / NEE / BSDF sample, the MIS bookkeeping — for a row block
inside one Pallas invocation: the path state (17 component planes) lives
in VMEM for all `max_depth` bounces, and HBM traffic is exactly the scene
tables in and 3 radiance planes out, once per sample.

Everything is the component-plane style of ops/shade_kernel.py; the math
mirrors render/wavefront.py + render/bsdf.py term for term (same PCG-R2
sampler streams, same MIS weights), so the XLA path remains the oracle.
spp is a grid dimension: sample s of row-block i accumulates into the same
output block (grid iterates samples innermost).

Reference lineage: the reference defines BOUNCES but never loops
(common.glsl:6); this is the BASELINE config-#3 extension, like
render/wavefront.py, at fused-kernel speed.
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
from kylespathtracer_tpu.scene.types import BSDF, Scene, bsdf_table
from kylespathtracer_tpu.utils.config import RenderConfig

_INV_PI = 1.0 / gmath.PI
_DELTA_PDF = 1e8

# R2 lattice / PCG constants (core/sampler.py:133-145).
_R2_A1 = 3242174889
_R2_A2 = 2447445413


# ------------------------------------------------------------- sampler

def _pcg_hash(x):
    """PCG-RXS-M-XS, plane form (core/sampler.pcg_hash)."""
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((state >> shift) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def _r2_pair(n_idx, stream):
    """n-th R2 point, PCG-rotated per stream (core/sampler.r2_pair)."""
    rot1 = _pcg_hash(stream)
    rot2 = _pcg_hash(rot1 ^ jnp.uint32(0x9E3779B9))
    # Mosaic has no uint32→f32 cast; after >>8 the value fits 24 bits, so
    # the int32 reinterpretation is exact.
    to_f32 = lambda v: v.astype(jnp.int32).astype(jnp.float32)
    u1 = to_f32(
        (n_idx * jnp.uint32(_R2_A1) + rot1) >> jnp.uint32(8)
    ) * jnp.float32(2 ** -24)
    u2 = to_f32(
        (n_idx * jnp.uint32(_R2_A2) + rot2) >> jnp.uint32(8)
    ) * jnp.float32(2 ** -24)
    return u1, u2


def _stream(pid, pair: int):
    return pid * jnp.uint32(0x85EBCA6B) + jnp.uint32(pair)


# ------------------------------------------------------------- geometry

def _trace_inside(sc, ro, rd, excl, nP, nS, nB):
    """sk._trace with far-root sphere hits for rays starting inside a
    sphere (scene/intersect._sphere_hits inside_hits=True): dielectric
    continuation rays must exit through the far surface."""
    return sk._trace(sc, ro, rd, excl, nP, nS, nB, inside_hits=True)


def _light_sample(sc, hl, u1, u2):
    """Uniform solid-angle cone toward the light (wavefront._sample_light)."""
    lx, ly, lz, lr = sk._light_vec(sc)
    lv = (lx - hl[0], ly - hl[1], lz - hl[2])
    d2 = jnp.maximum(sk._dot(lv, lv), 1e-12)
    r2 = lr * lr
    cos_max = jnp.sqrt(jnp.maximum(1e-9, 1.0 - jnp.clip(r2 / d2, 0.0, 1.0)))
    ct = 1.0 - u1 * (1.0 - cos_max)
    st = jnp.sqrt(jnp.maximum(1e-12, 1.0 - ct * ct))
    phi = gmath.TWOPI * u2
    w = sk._normalize(lv)
    f, r = sk._basis(w)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    wi = (
        f[0] * (st * cp) + r[0] * (st * sp) + w[0] * ct,
        f[1] * (st * cp) + r[1] * (st * sp) + w[1] * ct,
        f[2] * (st * cp) + r[2] * (st * sp) + w[2] * ct,
    )
    pdf = 1.0 / (gmath.TWOPI * jnp.maximum(1e-9, 1.0 - cos_max))
    outside = d2 > r2
    return wi, pdf, outside


def _nee_pdf_from(sc, ro):
    """Solid-angle pdf the NEE sampler assigns to a light-reaching
    direction from `ro` (wavefront._nee_pdf_toward_light)."""
    lx, ly, lz, lr = sk._light_vec(sc)
    lv = (lx - ro[0], ly - ro[1], lz - ro[2])
    d2 = jnp.maximum(sk._dot(lv, lv), 1e-12)
    cos_max = jnp.sqrt(
        jnp.maximum(1e-9, 1.0 - jnp.clip(lr * lr / d2, 0.0, 1.0))
    )
    return 1.0 / (gmath.TWOPI * jnp.maximum(1e-9, 1.0 - cos_max))


def _table_f32(tab_ref, oid, nK):
    """Per-id scalar table lookup as a where-chain (K static, small)."""
    out = jnp.zeros_like(oid, dtype=jnp.float32)
    for k in range(nK):
        out = jnp.where(oid == k, tab_ref[k, 0], out)
    return out


def _table_i32(tab_ref, oid, nK):
    out = jnp.zeros_like(oid)
    for k in range(nK):
        out = jnp.where(oid == k, tab_ref[k, 0], out)
    return out


# ------------------------------------------------------------- BSDF

def _bsdf_eval_pdf(kind, rho_d, rho_s, n, wo, wi, gloss):
    """(f·cosθi per channel, pdf) for non-delta lobes (bsdf.eval_pdf)."""
    ci = jnp.maximum(0.0, sk._dot(n, wi))

    f_d = tuple(rho_d[c] * (_INV_PI * ci) for c in range(3))
    pdf_d = ci * _INV_PI

    refl = sk._reflect((-wo[0], -wo[1], -wo[2]), n)
    ca = jnp.maximum(0.0, sk._dot(refl, wi))
    ca_g = sk._powi(ca, int(gloss))
    fac_g = (gloss + 2.0) / gmath.TWOPI * ca_g * ci
    f_g = tuple(rho_s[c] * fac_g for c in range(3))
    pdf_g = (gloss + 1.0) / gmath.TWOPI * ca_g

    is_g = kind == BSDF.GLOSSY
    is_delta = kind >= BSDF.MIRROR
    zero = is_delta | (ci <= 0.0)
    f = tuple(
        jnp.where(zero, 0.0, jnp.where(is_g, f_g[c], f_d[c])) for c in range(3)
    )
    pdf = jnp.where(zero, 0.0, jnp.where(is_g, pdf_g, pdf_d))
    return f, pdf


def _bsdf_sample(kind, rho_d, rho_s, eta, n, wo, gloss, u1, u2, u3):
    """Sample wi from the BSDF (bsdf.sample): returns
    (wi, weight3, pdf, is_delta, transmit)."""
    f, r = sk._basis(n)
    phi = gmath.TWOPI * u2
    cp, sp = jnp.cos(phi), jnp.sin(phi)

    # DIFFUSE: cosine hemisphere.
    srt = jnp.sqrt(u1)
    x = srt * cp
    y = srt * sp
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    wi_d = (
        f[0] * x + r[0] * y + n[0] * z,
        f[1] * x + r[1] * y + n[1] * z,
        f[2] * x + r[2] * y + n[2] * z,
    )
    pdf_d = z * _INV_PI

    # GLOSSY: power-cosine around the mirror direction.
    refl = sk._reflect((-wo[0], -wo[1], -wo[2]), n)
    fg, rg = sk._basis(refl)
    ca = u1 ** (1.0 / (gloss + 1.0))
    sa = jnp.sqrt(jnp.maximum(0.0, 1.0 - ca * ca))
    wi_g = (
        fg[0] * (sa * cp) + rg[0] * (sa * sp) + refl[0] * ca,
        fg[1] * (sa * cp) + rg[1] * (sa * sp) + refl[1] * ca,
        fg[2] * (sa * cp) + rg[2] * (sa * sp) + refl[2] * ca,
    )
    ci_g = sk._dot(n, wi_g)
    wfac_g = jnp.maximum(0.0, (gloss + 2.0) / (gloss + 1.0) * ci_g)
    pdf_g = (gloss + 1.0) / gmath.TWOPI * sk._powi(ca, int(gloss))

    # DIELECTRIC: Schlick-Fresnel reflect/refract with TIR.
    ci = jnp.maximum(1e-6, sk._dot(n, wo))
    sin2t = eta * eta * jnp.maximum(0.0, 1.0 - ci * ci)
    tir = sin2t > 1.0
    cost = jnp.sqrt(jnp.maximum(1e-9, 1.0 - sin2t))
    r0 = (eta - 1.0) / (eta + 1.0)
    r0 = r0 * r0
    u = 1.0 - ci
    u2_ = u * u
    fres = r0 + (1.0 - r0) * u2_ * u2_ * u
    p_reflect = jnp.where(tir, 1.0, fres)
    take_refl = u3 < p_reflect
    fac = eta * ci - cost
    wi_t = sk._normalize(
        (
            -wo[0] * eta + n[0] * fac,
            -wo[1] * eta + n[1] * fac,
            -wo[2] * eta + n[2] * fac,
        )
    )
    wi_x = sk._where_v(take_refl, refl, wi_t)

    is_g = kind == BSDF.GLOSSY
    is_m = kind == BSDF.MIRROR
    is_x = kind == BSDF.DIELECTRIC
    is_delta = is_m | is_x

    wi = sk._where_v(
        is_x, wi_x, sk._where_v(is_m, refl, sk._where_v(is_g, wi_g, wi_d))
    )
    weight = tuple(
        jnp.where(
            is_delta, rho_d[c] + rho_s[c],
            jnp.where(is_g, rho_s[c] * wfac_g, rho_d[c]),
        )
        for c in range(3)
    )
    pdf = jnp.where(is_delta, _DELTA_PDF, jnp.where(is_g, pdf_g, pdf_d))
    transmit = is_x & ~take_refl
    return wi, weight, pdf, is_delta, transmit


# ------------------------------------------------------------- the block

def path_block(
    sc, bsdf_ref, ior_ref, cam, orient, frame, row0,
    *, counts, nK, gloss, width, height, fov, block_rows, max_depth, spp,
    sample_id,
):
    """One radiance sample for rows [row0, row0+block_rows): pure values →
    3 HDR radiance planes. `sample_id` is the in-frame sample index s."""
    sc = dict(sc)
    sc["nK"] = nK
    shape = (block_rows, width)
    light_id = sc["light_id_arr"][0, 0]

    px = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    py = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    pid = (
        py.astype(jnp.uint32) * jnp.uint32(width) + px.astype(jnp.uint32)
    )
    n_idx = (frame * jnp.int32(spp) + sample_id).astype(jnp.uint32)

    # Raygen (same as frame_kernel.frame_block).
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
        jnp.zeros(shape, jnp.float32) + cam[0, 0],
        jnp.zeros(shape, jnp.float32) + cam[0, 1],
        jnp.zeros(shape, jnp.float32) + cam[0, 2],
    )

    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    tp = (one, one, one)
    rad = (zero, zero, zero)
    alive = jnp.ones(shape, jnp.bool_)
    excl = jnp.full(shape, -1, jnp.int32)
    prev_pdf = zero
    prev_delta = jnp.ones(shape, jnp.bool_)
    prev_nee = jnp.zeros(shape, jnp.bool_)
    inside = jnp.zeros(shape, jnp.bool_)

    for bounce in range(max_depth):
        t, oid = _trace_inside(sc, ro, rd, excl, *counts)
        hit = (oid != 0) & alive
        hl = (ro[0] + rd[0] * t, ro[1] + rd[1] * t, ro[2] + rd[2] * t)

        n_geo, _ = fk._normal_curv(sc, counts, hl, oid)
        # Misses keep a finite placeholder normal (masked out by `hit`).
        bad = sk._dot(n_geo, n_geo) < 0.5
        n_geo = sk._where_v(bad, (zero, one, zero), n_geo)
        into = sk._dot(rd, n_geo) < 0.0
        n = sk._where_v(into, n_geo, (-n_geo[0], -n_geo[1], -n_geo[2]))
        wo = (-rd[0], -rd[1], -rd[2])

        alb, emi, ene = sk._surface(sc, oid, hl, nK)
        kind = _table_i32(bsdf_ref, oid, nK)
        ior = _table_f32(ior_ref, oid, nK)
        rho_d = tuple(alb[c] * ene[0] for c in range(3))
        rho_s = tuple(alb[c] * ene[1] for c in range(3))

        # Emitted radiance, MIS-weighted against the previous NEE
        # (wavefront.py bounce_body).
        is_light = oid == light_id
        pdf_nee_prev = _nee_pdf_from(sc, ro)
        w_mis = jnp.where(
            prev_delta | ~prev_nee | ~is_light,
            1.0,
            prev_pdf / jnp.maximum(1e-12, prev_pdf + pdf_nee_prev),
        )
        emi_fac = jnp.where(hit, w_mis, 0.0)
        rad = tuple(rad[c] + tp[c] * emi[c] * emi_fac for c in range(3))

        # Next-event estimation.
        u1, u2 = _r2_pair(n_idx, _stream(pid, bounce * 3 + 0))
        l_wi, l_pdf, l_ok = _light_sample(sc, hl, u1, u2)
        ro_off = (
            hl[0] + n[0] * gmath.EPS,
            hl[1] + n[1] * gmath.EPS,
            hl[2] + n[2] * gmath.EPS,
        )
        # Shadow rays use near-root semantics (wavefront.py does not pass
        # inside_hits to the NEE visibility intersect). Occlusion-style:
        # `nearest hit == light` without the nearest-(t,id) sweep — the
        # rounded box collapses to the convex segment-distance test
        # (sk._light_visible; same trace diet as the frame kernel).
        visible = sk._light_visible(sc, counts, ro_off, l_wi, oid)
        f_cos, b_pdf = _bsdf_eval_pdf(kind, rho_d, rho_s, n, wo, l_wi, gloss)
        w_nee = l_pdf / jnp.maximum(1e-12, l_pdf + b_pdf)
        nee_on = hit & visible & l_ok & ~is_light
        nee_fac = jnp.where(
            nee_on, w_nee / jnp.maximum(1e-12, l_pdf), 0.0
        )
        rad = tuple(
            rad[c] + tp[c] * f_cos[c] * sc["light_color"][0, c] * nee_fac
            for c in range(3)
        )

        # Continue the path with a BSDF sample.
        b1, b2 = _r2_pair(n_idx, _stream(pid, bounce * 3 + 1))
        b3, _ = _r2_pair(n_idx, _stream(pid, bounce * 3 + 2))
        eta_rel = jnp.where(inside, ior, 1.0 / jnp.maximum(ior, 1e-6))
        wi, weight, pdf, is_delta, transmit = _bsdf_sample(
            kind, rho_d, rho_s, eta_rel, n, wo, gloss, b1, b2, b3
        )
        new_tp = tuple(tp[c] * weight[c] for c in range(3))
        tp_max = jnp.maximum(new_tp[0], jnp.maximum(new_tp[1], new_tp[2]))
        alive = hit & (tp_max > 1e-5)

        off = sk._where_v(transmit, (-n[0], -n[1], -n[2]), n)
        ro = (
            hl[0] + off[0] * gmath.EPS,
            hl[1] + off[1] * gmath.EPS,
            hl[2] + off[2] * gmath.EPS,
        )
        rd = wi
        tp = tuple(jnp.where(alive, new_tp[c], 0.0) for c in range(3))
        excl = jnp.where(transmit | inside, -1, oid)
        prev_pdf = pdf
        prev_delta = is_delta
        prev_nee = hit & l_ok & ~is_light
        # where(transmit, ~inside, inside) == transmit XOR inside; the
        # select form lowers to an i8→i1 trunc Mosaic rejects.
        inside = transmit ^ inside

    return rad


def _path_kernel(
    *refs, counts, nK, gloss, width, height, fov, block_rows, max_depth, spp,
):
    in_refs = refs[:22]
    out_refs = refs[22:]
    sc = dict(zip(fk.SC_KEYS, in_refs[:17]))
    bsdf_ref, ior_ref = in_refs[17], in_refs[18]
    cam_ref, orient_ref, frame_ref = in_refs[19:]
    i = pl.program_id(0)
    s = pl.program_id(1)
    rad = path_block(
        sc, bsdf_ref, ior_ref, cam_ref, orient_ref, frame_ref[0, 0],
        i * block_rows,
        counts=counts, nK=nK, gloss=gloss, width=width, height=height,
        fov=fov, block_rows=block_rows, max_depth=max_depth, spp=spp,
        sample_id=s,
    )
    for ref, val in zip(out_refs, rad):
        @pl.when(s == 0)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(s > 0)
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


def pathtrace_jnp(scene: Scene, camera, config: RenderConfig, frame=0):
    """`path_block` over the whole image as plain jnp (no Pallas): the
    kernel math without the kernel, for fast default-suite parity tests
    (mirrors frame_kernel.frame_forward_jnp)."""
    H, W = config.height, config.width
    ops = fk.small_operands(scene, camera, frame)
    sc = dict(zip(fk.SC_KEYS, ops[:17]))
    kinds, iors = bsdf_table(scene.materials)
    counts = (
        int(scene.planes.shape[0]),
        int(scene.spheres.shape[0]),
        int(scene.boxes.shape[0]),
    )
    spp = max(1, config.spp)
    acc = None
    for s in range(spp):
        rad = path_block(
            sc, kinds.reshape(-1, 1), iors.reshape(-1, 1),
            ops[17], ops[18], ops[19][0, 0], jnp.int32(0),
            counts=counts, nK=int(scene.materials.s0.shape[0]),
            gloss=config.gloss, width=W, height=H, fov=config.fov,
            block_rows=H, max_depth=config.max_depth, spp=spp,
            sample_id=jnp.int32(s),
        )
        img = jnp.stack(rad, axis=-1)
        acc = img if acc is None else acc + img
    return acc / spp


def pathtrace_pallas(
    scene: Scene,
    camera,
    config: RenderConfig,
    frame=0,
    block_rows: int | None = None,
    interpret: bool = False,
):
    """HDR radiance image f32[H, W, 3], spp samples at depth max_depth —
    the Pallas counterpart of wavefront.pathtrace."""
    H, W = config.height, config.width
    spp = max(1, config.spp)
    if block_rows is None:
        block_rows = max(8, min(16, 32768 // (W * 4)))
    Hp = -(-H // block_rows) * block_rows

    counts = (
        int(scene.planes.shape[0]),
        int(scene.spheres.shape[0]),
        int(scene.boxes.shape[0]),
    )
    nK = int(scene.materials.s0.shape[0])
    kinds, iors = bsdf_table(scene.materials)

    kernel = functools.partial(
        _path_kernel,
        counts=counts, nK=nK, gloss=config.gloss, width=W, height=H,
        fov=config.fov, block_rows=block_rows, max_depth=config.max_depth,
        spp=spp,
    )

    small = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    img = lambda: pl.BlockSpec(
        (block_rows, W), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    f32 = jax.ShapeDtypeStruct((Hp, W), jnp.float32)

    ops = fk.small_operands(scene, camera, frame)
    outs = pl.pallas_call(
        kernel,
        grid=(Hp // block_rows, spp),
        in_specs=[small() for _ in range(22)],
        out_specs=[img() for _ in range(3)],
        out_shape=[f32] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        *ops[:17], kinds.reshape(-1, 1), iors.reshape(-1, 1), *ops[17:],
    )
    return jnp.stack([o[:H] for o in outs], axis=-1) / spp
