"""Windowed-select temporal reprojection kernel.

XLA lowers the reprojection's per-pixel 2×2 history gather
(common.glsl:677-693) to a generic TPU gather — measured ~240 ms per channel
set at 1080p, which dwarfs the whole shaded frame. This kernel replaces the
gather with a bounded *select window*: temporal reprojection only ever reads
near the current pixel (the camera moves a little per frame), so each tap is
expressed as

    value[p] = Σ_{|o|≤K, |l|≤K} [iy[p]-gy == o][ix[p]-gx == l] · prev[gy+o, gx+l]

— static row-slices and lane-rolls, pure VPU work, no gather at all. Taps
that land beyond K rows/cols are zero-weighted: the temporal history simply
restarts there, exactly like an off-screen tap (common.glsl:673-674) — and
under fast motion the reference's own velocity clamp (diffuse.frag:49-51)
already collapses the history to ~1 sample, so the bound is free in practice.

Both channel sets (diffuse + specular anchors) run in one kernel launch.
The neighboring row blocks are brought in by passing each history plane
three times with shifted BlockSpec index maps (block i-1, i, i+1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kylespathtracer_tpu.render import reproject as rep_mod


def _set_kernel(win, ho, dyrel, dxrel, w4, bh, K, out):
    """Accumulate one channel set into out = [r, g, b, cnt] lists.

    The bilinear tap weights are separable — w_{ty,tx} = wy_ty · wx_tx with
    per-axis bounds folded in — so the per-(o,l) coefficient factorizes:

        coeff(o,l) = Y_o · X_l,   Y_o = Σ_ty [dyrel==o-ty]·wy_ty,
                                  X_l = Σ_tx [dxrel==l-tx]·wx_tx

    computed once per row/column offset instead of 4 masked selects per
    term; the inner loop is then one multiply, one ID compare and 4 fmas.
    """
    wy0, wy1, wx0, wx1 = w4

    Y = {}
    for o in range(-K, K + 1):
        Y[o] = (
            jnp.where(dyrel == o, wy0, 0.0)
            + jnp.where(dyrel == o - 1, wy1, 0.0)
        )

    W = win[0].shape[1]
    for l in range(-K, K + 1):
        # rolled[:, gx] = p[:, gx + l] (wraps are masked by the tap bounds).
        rolled = [pltpu.roll(p, (-l) % W, axis=1) for p in win]
        X = (
            jnp.where(dxrel == l, wx0, 0.0)
            + jnp.where(dxrel == l - 1, wx1, 0.0)
        )
        for o in range(-K, K + 1):
            rows = [p[bh + o:2 * bh + o, :] for p in rolled]
            # ID-match on the tap texel (common.glsl:681-688); ids are stored
            # as float planes (exact for small ints).
            coeff = jnp.where(rows[4] == ho, Y[o] * X, 0.0)
            for c in range(4):
                out[c] = out[c] + coeff * rows[c]


def _reproject_kernel(
    ho_ref,
    dyrel, dxrel, wy0, wy1, wx0, wx1,
    # history planes: (below, cur, above) x (r, g, b, cnt, idf)
    *refs,
    bh, K,
):
    planes = refs[0:15]
    outs = refs[15:19]

    # concat (below, cur, above) per plane -> five (3bh, W) arrays.
    win = []
    for k in range(5):
        below, cur, above = planes[k], planes[5 + k], planes[10 + k]
        win.append(jnp.concatenate([below[:], cur[:], above[:]], axis=0))

    ho = ho_ref[:].astype(jnp.float32)

    acc = [jnp.zeros_like(wy0[:]) for _ in range(4)]
    _set_kernel(
        win, ho, dyrel[:], dxrel[:],
        (wy0[:], wy1[:], wx0[:], wx1[:]), bh, K, acc,
    )
    for c in range(4):
        outs[c][:] = acc[c]


def _queries(prev_cam, anchor, ho, fov, H, W):
    """XLA head: per-pixel window offsets and separable bilinear weights.

    The 2x2 tap weight factorizes exactly — w(tx,ty) = wy_ty * wx_tx — because
    both the bilinear fraction and the per-tap bounds check are per-axis
    (common.glsl:677-693 reads taps (ix+tx, iy+ty) with independent x/y
    clamping).  The off-screen `inside` reject (common.glsl:673-674) is folded
    into the x axis only so it is not applied twice.
    """
    iuv, duv, inside = rep_mod.reproject_query(
        prev_cam.loc, prev_cam.orient, anchor, fov, (H, W)
    )
    gy = jnp.arange(H, dtype=jnp.int32)[:, None]
    gx = jnp.arange(W, dtype=jnp.int32)[None, :]
    dyrel = iuv[..., 1] - gy
    dxrel = iuv[..., 0] - gx
    ix = iuv[..., 0]
    iy = iuv[..., 1]
    dx = duv[..., 0]
    dy = duv[..., 1]

    wy0 = jnp.where((iy >= 0) & (iy < H), 1.0 - dy, 0.0)
    wy1 = jnp.where((iy + 1 >= 0) & (iy + 1 < H), dy, 0.0)
    wx0 = jnp.where((ix >= 0) & (ix < W) & inside, 1.0 - dx, 0.0)
    wx1 = jnp.where((ix + 1 >= 0) & (ix + 1 < W) & inside, dx, 0.0)

    return dyrel, dxrel, (wy0, wy1, wx0, wx1)


def reproject_pallas(
    prev_cam,
    hl: jnp.ndarray,
    sl: jnp.ndarray,
    ho: jnp.ndarray,
    prev_d,  # Channel
    prev_s,  # Channel
    fov: float,
    window: int = 8,
    block_rows: int = 8,
    interpret: bool = False,
):
    """Both reprojections (diffuse anchor hl, specular anchor sl) in one
    kernel → ((rgb_d, cnt_d), (rgb_s, cnt_s)). Taps beyond `window` rows or
    columns drop their history (see module docstring)."""
    H, W = ho.shape
    if window > block_rows:
        import warnings

        warnings.warn(
            f"reproject window={window} exceeds the kernel's one-block halo "
            f"(block_rows={block_rows}); clamping to {block_rows}. Pass a "
            "larger block_rows to widen the vertical window.",
            stacklevel=2,
        )
    K = min(window, block_rows)
    nb = -(-H // block_rows)
    Hp = nb * block_rows
    pad = Hp - H

    def pad_rows(a):
        if pad == 0:
            return a
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    img = lambda: pl.BlockSpec(
        (block_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    below = lambda: pl.BlockSpec(
        (block_rows, W),
        lambda i: (jnp.maximum(i - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    above = lambda: pl.BlockSpec(
        (block_rows, W),
        lambda i: (jnp.minimum(i + 1, nb - 1), 0),
        memory_space=pltpu.VMEM,
    )

    def hist_planes(ch):
        idf = ch.oid.astype(jnp.float32)
        return [
            pad_rows(ch.rgb[..., 0]), pad_rows(ch.rgb[..., 1]),
            pad_rows(ch.rgb[..., 2]), pad_rows(ch.cnt), pad_rows(idf),
        ]

    kernel = functools.partial(_reproject_kernel, bh=block_rows, K=K)
    f32 = jax.ShapeDtypeStruct((Hp, W), jnp.float32)
    in_specs = (
        [img() for _ in range(7)]
        + [below() for _ in range(5)] + [img() for _ in range(5)]
        + [above() for _ in range(5)]
    )
    ho_p = pad_rows(ho)

    def one_set(anchor, prev):
        dyrel, dxrel, w4 = _queries(prev_cam, anchor, ho, fov, H, W)
        hist = hist_planes(prev)
        outs = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=[img() for _ in range(4)],
            out_shape=[f32] * 4,
            # The 22 full-width row-block operands sit right at the default
            # 16 MB scoped-vmem limit at 1080p; raise the per-kernel cap
            # (v5e has far more physical VMEM than the conservative default).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            ho_p, pad_rows(dyrel), pad_rows(dxrel),
            *[pad_rows(x) for x in w4],
            *hist, *hist, *hist,
        )
        rgb = jnp.stack([o[:H] for o in outs[0:3]], axis=-1)
        return rgb, outs[3][:H]

    return one_set(hl, prev_d), one_set(sl, prev_s)
