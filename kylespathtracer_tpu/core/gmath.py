"""Geometry/shading math toolkit.

Pure, broadcastable jnp functions. Every function here re-derives the math of
the reference's GLSL toolkit (reference: common.glsl:33-196) as array ops over
a trailing xyz axis, so the whole renderer vectorizes over arbitrary pixel
batch shapes `(..., 3)` and is differentiable by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Constants (reference: common.glsl:33-34).
EPS = 1e-3
IEPS = 0.999
ZFAR = 50.0
FOV = 1.5  # focal z of the ray direction, not an angle (common.glsl:33)
HPI = 1.5707963
PI = 3.1415926
TWOPI = 6.2831853
SQRT2 = 1.4142136
SC45 = 0.7071068


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the trailing xyz axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def dot_k(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the trailing xyz axis, keepdims kept."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalize; zero vectors map to zero instead of NaN."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jnp.reciprocal(jnp.sqrt(jnp.maximum(n2, eps)))


def normalize_fast(v: jnp.ndarray) -> jnp.ndarray:
    """GLSL-style normalize (no zero guard); use where inputs are nonzero."""
    return v * jnp.reciprocal(jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)))


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """GLSL reflect: i - 2*dot(n,i)*n."""
    return i - 2.0 * dot_k(n, i) * n


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def basis(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless orthonormal basis around unit n → (f, r).

    Pixar/Duff-style ONB, matching the reference's select on n.z
    (reference: common.glsl:53-59).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    s = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = 1.0 / (s + nz)
    b = -nx * ny * a
    f = jnp.stack([1.0 - nx * nx * a * s, b * s, -nx * s], axis=-1)
    r = jnp.stack([b, s - ny * ny * a, -ny], axis=-1)
    return f, r


def rotate_xy(p: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Pitch-then-yaw camera rotation.

    angle[..., 0] = pitch (rotates yz), angle[..., 1] = yaw (rotates xz),
    with the exact row-vector*mat2 composition of the reference
    (reference: common.glsl:61-67):
      y' =  y*cos(px) + z*sin(px)
      z1 = -y*sin(px) + z*cos(px)
      x' =  x*cos(yw) + z1*sin(yw)
      z' = -x*sin(yw) + z1*cos(yw)
    """
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    cx, cy = c[..., 0], c[..., 1]
    sx, sy = s[..., 0], s[..., 1]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    y2 = y * cx + z * sx
    z1 = -y * sx + z * cx
    x2 = x * cy + z1 * sy
    z2 = -x * sy + z1 * cy
    return jnp.stack([x2, y2, z2], axis=-1)


def linear_angle(d: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Apparent (linear) angle of a sphere of radius r at distance d.

    (reference: common.glsl:141-144)
    """
    # max-guard keeps d=0 (degenerate sample geometry; masked upstream) from
    # producing inf/inf→NaN through the clip; normal d is unaffected.
    return jnp.arcsin(jnp.clip(r / jnp.maximum(d, 1e-12), EPS, IEPS))


def tan_linear_angle(d: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """tan(linear_angle(d, r)) without the arcsin/tan round trip:
    tan(asin(x)) = x/sqrt(1-x²). Two transcendentals become one rsqrt —
    the cone samplers only ever need the tangent."""
    x = jnp.clip(r / jnp.maximum(d, 1e-12), EPS, IEPS)
    return x * jax.lax.rsqrt(1.0 - x * x)


def solid_angle(d2: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Solid angle of a sphere given squared distance and squared radius.

    (reference: common.glsl:146-149)
    """
    # max-guard: d2=0 with r2=0 (degenerate, masked upstream) is 0/0→NaN.
    return (1.0 - jnp.sqrt(1.0 - jnp.clip(r2 / jnp.maximum(d2, 1e-24), 0.0, 1.0))) * TWOPI


def schlick(r1, r2, vn) -> jnp.ndarray:
    """Schlick fresnel between refractive indices r1, r2 (common.glsl:151-154)."""
    r0 = (r1 - r2) / (r1 + r2)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - vn) ** 5


def lambertian(hn: jnp.ndarray, nlv: jnp.ndarray) -> jnp.ndarray:
    """Clamped cosine term max(eps, n.l) (common.glsl:156-158)."""
    return jnp.maximum(EPS, dot(nlv, hn))


def powi(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """x**n by squaring for static integer n — `pow` with a float exponent
    lowers to exp/log on the VPU; integral exponents are a few multiplies."""
    n = int(n)
    acc = None
    base = x
    while n:
        if n & 1:
            acc = base if acc is None else acc * base
        n >>= 1
        if n:
            base = base * base
    return acc if acc is not None else jnp.ones_like(x)


def pow_static(x: jnp.ndarray, e) -> jnp.ndarray:
    """x**e, using the integer fast path when e is a static integral."""
    if isinstance(e, (int, float)) and float(e).is_integer():
        return powi(x, int(e))
    return x ** e


def phong(rd: jnp.ndarray, hn: jnp.ndarray, nlv: jnp.ndarray, gloss) -> jnp.ndarray:
    """Phong lobe max(eps, l.reflect(rd,n))^gloss (common.glsl:160-162)."""
    return pow_static(jnp.maximum(EPS, dot(nlv, reflect(rd, hn))), gloss)


def mix(a, b, t):
    """GLSL mix(a, b, t) = a*(1-t) + b*t."""
    return a + (b - a) * t


def smoothstep01(t):
    """GLSL smoothstep(0, 1, t) interior polynomial t*t*(3-2t)."""
    return t * t * (3.0 - 2.0 * t)
