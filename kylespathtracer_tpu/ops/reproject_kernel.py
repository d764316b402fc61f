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


def _set_kernel_dyn(planes15, ho, dyrel, dxrel, w4, bh, K, acc_refs):
    """Accumulate one channel set into acc_refs = [r, g, b, cnt] refs.

    The bilinear tap weights are separable — w_{ty,tx} = wy_ty · wx_tx with
    per-axis bounds folded in — so the per-(o,l) coefficient factorizes:

        coeff(o,l) = Y_o · X_l,   Y_o = Σ_ty [dyrel==o-ty]·wy_ty,
                                  X_l = Σ_tx [dxrel==l-tx]·wx_tx

    one multiply, one ID compare and 4 fmas per live term — with runtime
    column/row skips: an (o, l) offset term only contributes where some
    pixel's tap window lands there, and under realistic motion (the
    velocity clamp caps useful motion at ~1 px/frame anyway) only ~2 of
    the (2K+1) offsets per axis are live. `pl.when` on per-block min/max
    bounds skips the dead ones — bitwise identical (a zero-X/zero-Y term
    adds exactly zero) at ~2/(2K+1)² of the select work. Row windows are
    assembled lazily from the (below, cur, above) block refs *inside* the
    live branches, so the dead offsets cost no VMEM copies either.

    Shared by this kernel and the monolithic temporal kernel
    (ops/frame_hist.py). Measured r05 at 1080p, K=4: the eager 81-term
    body this replaced cost 1.32 ms per channel set; this one 0.6-0.7 ms
    under the bench's slow pan."""
    wy0, wy1, wx0, wx1 = w4

    # Liveness bounds: the per-axis offset range actually touched by any
    # nonzero tap weight, as FOUR masked min/max scalar reductions — far
    # cheaper than materializing all (2K+1) offset masks and any()-reducing
    # each (which itself cost ~1 ms/frame at 1080p). A weight-zero offset
    # inside the range enters its branch and adds exactly zero (bitwise
    # identical); huge off-screen dyrel/dxrel values carry zero weights, so
    # they never widen the range. Masks use != 0, not > 0: border pixels
    # whose trunc-based bilinear fraction is negative carry NEGATIVE tap
    # weights (fu=-0.3 -> wx0=1.3, wx1=-0.3), and dropping those taps
    # overcounted border history by up to ~60% under a pan.
    big = jnp.int32(1 << 30)

    def _bounds(rel, w0, w1):
        lo = jnp.minimum(
            jnp.min(jnp.where(w0 != 0.0, rel, big)),
            jnp.min(jnp.where(w1 != 0.0, rel + 1, big)),
        )
        hi = jnp.maximum(
            jnp.max(jnp.where(w0 != 0.0, rel, -big)),
            jnp.max(jnp.where(w1 != 0.0, rel + 1, -big)),
        )
        return lo, hi

    ylo, yhi = _bounds(dyrel, wy0, wy1)
    xlo, xhi = _bounds(dxrel, wx0, wx1)

    W = dyrel.shape[1]
    for l in range(-K, K + 1):
        @pl.when((l >= xlo) & (l <= xhi))
        def _(l=l):
            X = (
                jnp.where(dxrel == l, wx0, 0.0)
                + jnp.where(dxrel == l - 1, wx1, 0.0)
            )
            shift = (-l) % W
            for o in range(-K, K + 1):
                @pl.when((o >= ylo) & (o <= yhi))
                def _(o=o, X=X, shift=shift):
                    Y = (
                        jnp.where(dyrel == o, wy0, 0.0)
                        + jnp.where(dyrel == o - 1, wy1, 0.0)
                    )
                    rows = []
                    for k in range(5):
                        below = planes15[k]
                        cur = planes15[5 + k]
                        above = planes15[10 + k]
                        # Image rows [row0+o, row0+bh+o) of the plane.
                        # |o| == bh (K == block_rows) is a whole
                        # neighboring block — no concat, and the sliced
                        # form would build zero-size ref slices.
                        if o == 0:
                            r_ = cur[:]
                        elif o == -bh:
                            r_ = below[:]
                        elif o == bh:
                            r_ = above[:]
                        elif o < 0:
                            r_ = jnp.concatenate(
                                [below[bh + o:bh], cur[0:bh + o]], axis=0
                            )
                        else:
                            r_ = jnp.concatenate(
                                [cur[o:bh], above[0:o]], axis=0
                            )
                        if shift:
                            r_ = pltpu.roll(r_, shift, axis=1)
                        rows.append(r_)
                    coeff = jnp.where(rows[4] == ho, Y * X, 0.0)
                    for c in range(4):
                        acc_refs[c][:] = acc_refs[c][:] + coeff * rows[c]


def _reproject_kernel(
    ho_ref,
    dyrel, dxrel, wy0, wy1, wx0, wx1,
    # history planes: (below, cur, above) x (r, g, b, cnt, idf)
    *refs,
    bh, K,
):
    planes = refs[0:15]
    outs = refs[15:19]
    ho = ho_ref[:].astype(jnp.float32)
    for c in range(4):
        outs[c][:] = jnp.zeros_like(wy0[:])
    _set_kernel_dyn(
        planes, ho, dyrel[:], dxrel[:],
        (wy0[:], wy1[:], wx0[:], wx1[:]), bh, K, outs,
    )


def _queries(prev_cam, anchor, ho, fov, H, W, row0=0):
    """XLA head: per-pixel window offsets and separable bilinear weights.

    The 2x2 tap weight factorizes exactly — w(tx,ty) = wy_ty * wx_tx — because
    both the bilinear fraction and the per-tap bounds check are per-axis
    (common.glsl:677-693 reads taps (ix+tx, iy+ty) with independent x/y
    clamping).  The off-screen `inside` reject (common.glsl:673-674) is folded
    into the x axis only so it is not applied twice. `anchor` may cover only
    image rows [row0, row0+rows) (sharded tiles); H/W always describe the
    FULL image so the NDC mapping and bounds are global.
    """
    iuv, duv, inside = rep_mod.reproject_query(
        prev_cam.loc, prev_cam.orient, anchor, fov, (H, W)
    )
    rows = anchor.shape[-3] if anchor.ndim >= 3 else H
    gy = row0 + jnp.arange(rows, dtype=jnp.int32)[:, None]
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
    image_height: int | None = None,
    row_base=0,
    hist_halo: int = 0,
):
    """Both reprojections (diffuse anchor hl, specular anchor sl) in one
    kernel → ((rgb_d, cnt_d), (rgb_s, cnt_s)). Taps beyond `window` rows or
    columns drop their history (see module docstring).

    Full-frame by default. `image_height`/`row_base`/`hist_halo` select
    TILE mode — the per-device row block of the sharded renderer
    (parallel/shard.py, mirroring ops/frame_hist.py tile mode): hl/sl/ho
    cover image rows [row_base, row_base+rows) of an `image_height`-tall
    image (row_base may be traced), and the history channels are a row
    WINDOW of shape (rows + 2*hist_halo, W) from the ppermute halo
    exchange. rows and hist_halo must be multiples of block_rows, and
    hist_halo >= the window K."""
    rows, W = ho.shape
    tile = image_height is not None and image_height != rows
    H = image_height if image_height is not None else rows
    if window > block_rows:
        import warnings

        warnings.warn(
            f"reproject window={window} exceeds the kernel's one-block halo "
            f"(block_rows={block_rows}); clamping to {block_rows}. Pass a "
            "larger block_rows to widen the vertical window.",
            stacklevel=2,
        )
    K = min(window, block_rows)
    if tile:
        if rows % block_rows or hist_halo % block_rows:
            raise ValueError(
                f"tile mode needs rows ({rows}) and hist_halo ({hist_halo}) "
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
        nb = rows // block_rows
        hb = hist_halo // block_rows
        pad = 0
    else:
        nb = -(-rows // block_rows)
        hb = 0
        pad = nb * block_rows - rows
    wb = nb + 2 * hb
    Rp = nb * block_rows

    def pad_rows(a):
        if pad == 0:
            return a
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    img = lambda: pl.BlockSpec(
        (block_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    cur = lambda: pl.BlockSpec(
        (block_rows, W), lambda i: (i + hb, 0), memory_space=pltpu.VMEM
    )
    below = lambda: pl.BlockSpec(
        (block_rows, W),
        lambda i: (jnp.maximum(i + hb - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    above = lambda: pl.BlockSpec(
        (block_rows, W),
        lambda i: (jnp.minimum(i + hb + 1, wb - 1), 0),
        memory_space=pltpu.VMEM,
    )

    def hist_planes(ch):
        idf = ch.oid.astype(jnp.float32)
        return [
            pad_rows(ch.rgb[..., 0]), pad_rows(ch.rgb[..., 1]),
            pad_rows(ch.rgb[..., 2]), pad_rows(ch.cnt), pad_rows(idf),
        ]

    kernel = functools.partial(_reproject_kernel, bh=block_rows, K=K)
    f32 = jax.ShapeDtypeStruct((Rp, W), jnp.float32)
    in_specs = (
        [img() for _ in range(7)]
        + [below() for _ in range(5)] + [cur() for _ in range(5)]
        + [above() for _ in range(5)]
    )
    ho_p = pad_rows(ho)

    def one_set(anchor, prev):
        dyrel, dxrel, w4 = _queries(
            prev_cam, anchor, ho, fov, H, W, row0=row_base
        )
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
        rgb = jnp.stack([o[:rows] for o in outs[0:3]], axis=-1)
        return rgb, outs[3][:rows]

    return one_set(hl, prev_d), one_set(sl, prev_s)
