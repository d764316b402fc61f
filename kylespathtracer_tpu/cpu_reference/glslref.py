"""CPU (NumPy) re-execution of the reference's GLSL math.

This module is the *golden oracle* for the test suite: a direct, independent
NumPy port of every formula in the reference's `common.glsl`, with GLSL
semantics preserved — int32 two's-complement wraparound, float32 evaluation,
column-major mat3 row-vector products. It deliberately shares no code with
the JAX implementation so a test agreement is meaningful.

Functions are vectorized over a leading pixel batch where convenient, vec3s
as trailing-axis arrays. File/line citations point into /root/reference/.
"""

from __future__ import annotations

import numpy as np

f32 = np.float32
i32 = np.int32

EPS = f32(0.001)
IEPS = f32(0.999)
ZFAR = f32(50.0)
FOV = f32(1.5)
PI = f32(3.1415926)
TWOPI = f32(6.2831853)

# Scene constants (common.glsl:220-235).
LIGHT, FLOOR, WALL1, BOX, WALL2, CEIL = 1, 2, 3, 4, 6, 7
LIGHT_SPHERE = np.array([6.0, 5.0, -4.0, 1.0], f32)
LIGHT_COLOR = np.array([10.0, 10.0, 10.0], f32)
PLANES = {
    FLOOR: np.array([0.0, 1.0, 0.0, 0.0], f32),
    CEIL: np.array([0.0, -1.0, 0.0, 10.0], f32),
    WALL1: np.array([-1.0, 0.0, 0.0, 10.0], f32),
    WALL2: np.array([0.0, 0.0, 1.0, 10.0], f32),
}
BOX_CENTER = np.array([7.5, 0.93, -7.5], f32)
BOX_HALF = np.array([0.8, 0.8, 0.8], f32)
BOX_ROUND = f32(0.1)


def _dot(a, b):
    return np.sum(a * b, axis=-1)


def _length(v):
    return np.sqrt(np.sum(v * v, axis=-1))


def _normalize(v):
    return v / _length(v)[..., None]


# ---------------------------------------------------------------- RNG (G3)

def gen_seed(frame, px, py, res_x, res_y):
    """common.glsl:39-41, int32 wraparound."""
    with np.errstate(over="ignore"):
        frame = i32(frame)
        px = np.asarray(px, i32)
        py = np.asarray(py, i32)
        a = i32(frame << 12) + px + (py << 1)
        return a ^ (px * i32(res_y)) ^ (py * i32(res_x))


def weyl3(v):
    """common.glsl:43-45: fract(float(v*k)/2^24) with int32 wrap."""
    v = np.asarray(v, i32)
    with np.errstate(over="ignore"):
        prod = v[..., None] * np.array([13743434, 11258243, 9222443], i32)
    x = prod.astype(f32) / f32(16777216.0)
    return x - np.floor(x)


def logit3(v):
    """common.glsl:48-51."""
    t = f32(0.988) * (v + f32(0.006))
    return np.log(t / (f32(1.0) - t)) * f32(0.221) + f32(0.5)


def uniform_sphere(seed):
    return logit3(weyl3(seed)) * f32(2.0) - f32(1.0)


def uniform_dir(seed):
    return _normalize(uniform_sphere(seed))


def cos_hemi_dir(hn, seed):
    return _normalize(hn + uniform_dir(seed) * IEPS)


def uniform_cone_dir(lv, lr, seed):
    """common.glsl:188-196."""
    rnd = weyl3(seed)
    sa = linear_angle(_length(lv), lr)
    rad = np.sqrt(rnd[..., 0]) * np.tan(sa)
    tha = rnd[..., 1] * TWOPI
    nlv = _normalize(lv)
    r, u = basis(nlv)
    return _normalize(
        nlv + rad[..., None] * (r * np.cos(tha)[..., None] + u * np.sin(tha)[..., None])
    )


# --------------------------------------------------------- geometry (G4/G5)

def basis(n):
    """common.glsl:53-59 → (f, r)."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    s = np.where(nz >= 0.0, f32(1.0), f32(-1.0))
    a = f32(1.0) / (s + nz)
    b = -nx * ny * a
    f = np.stack([f32(1.0) - nx * nx * a * s, b * s, -nx * s], axis=-1)
    r = np.stack([b, s - ny * ny * a, -ny], axis=-1)
    return f, r


def rotate_xy(p, angle):
    """common.glsl:61-67: o.yz *= mat2(cx,sx,-sx,cx); o.xz *= mat2(cy,sy,-sy,cy)."""
    angle = np.asarray(angle, f32)
    cx, cy = np.cos(angle[..., 0]), np.cos(angle[..., 1])
    sx, sy = np.sin(angle[..., 0]), np.sin(angle[..., 1])
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    y2 = y * cx + z * sx
    z1 = -y * sx + z * cx
    x2 = x * cy + z1 * sy
    z2 = -x * sy + z1 * cy
    return np.stack([x2, y2, z2], axis=-1)


def linear_angle(d, r):
    return np.arcsin(np.clip(r / d, EPS, IEPS))


def solid_angle(d2, r2):
    return (f32(1.0) - np.sqrt(f32(1.0) - np.clip(r2 / d2, 0.0, 1.0))) * TWOPI


def schlick(r1, r2, vn):
    r0 = (r1 - r2) / (r1 + r2)
    r0 = r0 * r0
    return r0 + (f32(1.0) - r0) * (f32(1.0) - vn) ** f32(5.0)


def lambertian(hn, nlv):
    return np.maximum(EPS, _dot(nlv, hn))


def reflect(i, n):
    return i - f32(2.0) * _dot(n, i)[..., None] * n


def phong(rd, hn, nlv, gloss):
    return np.maximum(EPS, _dot(nlv, reflect(rd, hn))) ** f32(gloss)


# ------------------------------------------------------------- color (G6)

def linear_srgb(x):
    return np.where(
        x <= f32(0.0031308),
        f32(12.92) * x,
        f32(1.055) * np.power(np.maximum(x, 1e-10), f32(1.0 / 2.4)) - f32(0.055),
    )


def srgb_linear(x):
    return np.where(
        x <= f32(0.04045),
        x / f32(12.92),
        np.power(np.maximum((x + f32(0.055)) / f32(1.055), 1e-10), f32(2.4)),
    )


def aces_fitted(color):
    """common.glsl:120-139; GLSL vec*mat3 dots against columns."""
    m1 = np.array(
        [
            [0.59719, 0.35458, 0.04823],
            [0.07600, 0.90834, 0.01566],
            [0.02840, 0.13383, 0.83777],
        ],
        f32,
    )
    m2 = np.array(
        [
            [1.60475, -0.53108, -0.07367],
            [-0.10208, 1.10813, -0.00605],
            [-0.00327, -0.07276, 1.07602],
        ],
        f32,
    )
    c = color @ m1.T
    a = c * (c + f32(0.0245786)) - f32(0.000090537)
    b = c * (f32(0.983729) * c + f32(0.4329510)) + f32(0.238081)
    c = (a / b) @ m2.T
    return np.clip(c, 0.0, 1.0)


# ------------------------------------------------------------- scene (G8)

def sd_box(p, half):
    d = np.abs(p) - half
    inside = np.minimum(np.maximum(d[..., 0], np.maximum(d[..., 1], d[..., 2])), f32(0.0))
    outside = _length(np.maximum(d, f32(0.0)))
    return inside + outside


def get_surface(ho, hl):
    """common.glsl:237-262 → (albedo, emission, energy2). Scalar ho."""
    ho = int(ho)
    hl = np.asarray(hl, f32)
    if ho == LIGHT:
        alb = np.ones(3, f32)
        emi = LIGHT_COLOR.copy()
        ene = np.array([1.0, 1.0], f32)
    elif ho == BOX:
        chk = float(
            int(np.floor(hl[0] * 4) + np.floor(hl[1] * 4) + np.floor(hl[2] * 4)) & 1
        )
        alb = np.full(3, f32(0.025 + 0.1 * chk))
        emi = np.zeros(3, f32)
        ene = np.array([1.0, 1.0], f32)
    elif ho < 1:
        alb = np.zeros(3, f32)
        emi = np.zeros(3, f32)
        ene = np.zeros(2, f32)
    else:
        chk = float(int(np.floor(hl[0]) + np.floor(hl[1]) + np.floor(hl[2])) & 1)
        refl = float(ho in (FLOOR, CEIL)) * (0.5 + chk) * 0.2 + 0.8
        cm = np.cos(f32(ho)) * f32(0.025)
        sm = np.sin(f32(ho)) * f32(0.025)
        alb = np.array([0.05 + cm, 0.05 + sm, 0.05 - (cm + sm) * 0.25], f32) * f32(refl)
        emi = np.zeros(3, f32)
        ene = np.array([refl, refl * 0.5], f32)
    return alb, emi, ene * f32(0.7)


def sdf(p, exclude=-1):
    """common.glsl:264-273 → (distance, id), vectorized over batch."""
    p = np.asarray(p, f32)
    batch = p.shape[:-1]
    d = np.full(batch, ZFAR, f32)
    oid = np.zeros(batch, i32)

    def consider(dist, this_id):
        # sdMin keeps the accumulated entry only on strict <, so the candidate
        # wins ties (common.glsl:199-203).
        nonlocal d, oid
        if exclude == this_id:
            return
        take = dist <= d
        d = np.where(take, dist, d)
        oid = np.where(take, i32(this_id), oid)

    for pid, pl in PLANES.items():
        consider(_dot(p, pl[:3]) + pl[3], pid)
    consider(_length(p - LIGHT_SPHERE[:3]) - LIGHT_SPHERE[3], LIGHT)
    consider(sd_box(p - BOX_CENTER, BOX_HALF) - BOX_ROUND, BOX)
    return d, oid


def norcurv(p, ep=EPS):
    """common.glsl:276-281."""
    e = np.array([[ep, -ep, -ep], [-ep, -ep, ep], [-ep, ep, -ep], [ep, ep, ep]], f32)
    t = np.stack([sdf(p + e[k])[0] for k in range(4)], axis=-1)
    n = _normalize(np.einsum("...i,ik->...k", t, e))
    c = f32(0.25) / ep * (np.sum(t, axis=-1) - f32(4.0) * sdf(p)[0])
    return n, c


def march(ro, rd, exclude=-1, steps=255):
    """common.glsl:283-295, vectorized with done-mask."""
    ro = np.asarray(ro, f32)
    rd = np.asarray(rd, f32)
    batch = ro.shape[:-1]
    t = np.zeros(batch, f32)
    hid = np.zeros(batch, i32)
    done = np.zeros(batch, bool)
    missed = np.zeros(batch, bool)
    for _ in range(steps):
        if done.all():
            break
        d, oid = sdf(ro + rd * t[..., None], exclude)
        hit_now = d < EPS
        t_new = np.where(done, t, t + d)
        miss_now = (t_new > ZFAR) & ~hit_now
        hid = np.where(done, hid, np.where(miss_now, 0, oid))
        missed = np.where(done, missed, miss_now)
        done = done | hit_now | miss_now
        t = t_new
    t = np.where(missed, ZFAR, np.minimum(t, ZFAR))
    return t, hid
