"""Differentiable fused frame: custom VJP around the forward Pallas kernel.

The XLA pass pipeline is the gradient *reference*, but at 1080p its backward
saves full-image activations for every MIS intermediate — the fwd+bwd frame
is HBM-bandwidth-bound (≈1.1 s/frame measured in round 3's opening state).
This module makes the fused Pallas forward (ops/frame_kernel.py)
differentiable with a recompute-everything backward:

* forward: `frame_forward_pallas`, unchanged cost (~5 ms @1080p after the
  round-4 occlusion-trace diet); residuals saved = (scene, camera, frame)
  — a few KB of parameter tables, zero activation traffic.
* backward: a second Pallas kernel over 2-D image blocks. Each block
  re-runs the forward math in VMEM (`frame_kernel.frame_block`) and applies
  `jax.vjp` of that pure block function to the incoming cotangent planes,
  accumulating the tiny d(scene)/d(camera) tables across grid steps. HBM
  traffic in the whole backward is exactly the 13 cotangent planes read
  once — the `jax.checkpoint` FLOPs-for-bandwidth trade taken to its limit
  (~10 ms @1080p; fwd+bwd 16.0 ms device-resident, BENCH_r04). When the
  LOSS is also known and per-pixel, ops/loss_kernel.py collapses both
  dispatches into one kernel (11.1 ms).

Gradient semantics match the XLA path: analytic-intersection derivatives
(the closed forms differentiate to the same values scene/sdf.ift_backward
produces), hard-visibility masks contribute zero, and
`config.soft_shadows > 0` smooths direct-light sphere silhouettes exactly
like render/mis.dual_mis (reference visibility: common.glsl:348-353).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kylespathtracer_tpu.ops import frame_kernel as fk
from kylespathtracer_tpu.scene.types import Scene
from kylespathtracer_tpu.utils.config import RenderConfig

# Indices into the 20 small operands (frame_kernel.small_operands order)
# that receive gradients: planes, spheres, boxes, light_color, light,
# mat_s0, mat_s1, alb_const, alb_scale, emission, en_const, en_scale,
# cam, orient. (ids/freq/frame are integer or piecewise-constant.)
DIFF_IDX = (0, 2, 4, 6, 7, 9, 10, 12, 13, 14, 15, 16, 17, 18)


def _f0(x):
    """float0 cotangent for an integer-dtype primal (JAX convention)."""
    return np.zeros(np.shape(x), jax.dtypes.float0)


def _frame_bwd_kernel(
    *refs, counts, nK, gloss, width, height, fov, block_rows, block_cols,
    soft_beta, smp, decorrelate, biased, present,
):
    n_present = sum(present)
    in_refs = refs[:21]
    g_refs = refs[21:21 + n_present]
    out_refs = refs[21 + n_present:]
    i = pl.program_id(0)
    j = pl.program_id(1)

    vals = [r[:] for r in in_refs]
    frame = vals[19][0, 0]
    row_base = vals[20][0, 0]
    diff_in = tuple(vals[k] for k in DIFF_IDX)

    def f(diff_vals):
        v = list(vals)
        for k, dv in zip(DIFF_IDX, diff_vals):
            v[k] = dv
        sc = dict(zip(fk.SC_KEYS, v[:17]))
        outs = fk.frame_block(
            sc, v[17], v[18], frame, row_base + i * block_rows,
            counts=counts, nK=nK, gloss=gloss, width=width, height=height,
            fov=fov, block_rows=block_rows, soft_beta=soft_beta,
            block_cols=block_cols, col0=j * block_cols, smp=smp,
            decorrelate=decorrelate, biased=biased,
        )
        # Only the float planes whose cotangent is symbolically nonzero
        # (`present`); oid carries none. The transposed jaxpr then DCEs the
        # whole backward chain of the dropped planes (e.g. depth/curv in an
        # image-only loss: the primary-intersect and curvature backward).
        return tuple(o for o, p in zip(outs[:13], present) if p)

    _, vjp = jax.vjp(f, diff_in)
    (grads,) = vjp(tuple(r[:] for r in g_refs))

    first = (i == 0) & (j == 0)
    for ref, g in zip(out_refs, grads):
        @pl.when(first)
        def _(ref=ref, g=g):
            ref[:] = g

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, g=g):
            ref[:] = ref[:] + g


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def frame_backward_pallas(
    scene: Scene,
    camera,
    frame,
    g: dict,
    config: RenderConfig,
    block_rows: int = 8,
    block_cols: int | None = None,
    interpret: bool = False,
    vmem_mb: int = 64,
    row_base=0,
    rows: int | None = None,
):
    """Run the backward kernel → tuple of gradients in DIFF_IDX order.

    `row_base`/`rows` restrict the cotangent planes (and the recompute
    sweep) to image rows [row_base, row_base+rows) — the per-device tile of
    the sharded trainer (parallel/shard.py). Per-tile gradients are partial
    sums; the caller psums them over the mesh axis."""
    H, W = (rows if rows is not None else config.height), config.width
    if block_cols is None:
        # Round-4 sweep at 1080p (post trace-diet, scan-slope): (8,1024)
        # 9.9 ms < (16,512) 10.5 < (8,1920 @100MB) 11.2 < (16,1024 @100MB)
        # 11.8 < (8,512) 14.6; (16,1024)/(32,512) exceed 64 MB VMEM. One
        # f32 plane at (8,1024) is 32 KB, leaving room for the transposed
        # jaxpr's live forward residuals under the 64 MB cap.
        block_cols = min(1024, _round_up(W, 128))
    Hp = _round_up(H, block_rows)
    Wp = _round_up(W, block_cols)

    ops = fk.small_operands(scene, camera, frame)
    counts = (
        int(scene.planes.shape[0]),
        int(scene.spheres.shape[0]),
        int(scene.boxes.shape[0]),
    )
    nK = int(scene.materials.s0.shape[0])

    # Which of the 13 float-plane cotangents are symbolically nonzero. A
    # missing/None entry means the caller's loss provably never touched the
    # plane (custom_vjp symbolic_zeros): drop it from the kernel entirely —
    # the transposed jaxpr then DCEs its whole backward chain.
    names = [
        ("add_d", 0), ("add_d", 1), ("add_d", 2),
        ("add_s", 0), ("add_s", 1), ("add_s", 2),
        ("alb", 0), ("alb", 1), ("alb", 2),
        ("ene", 0), ("ene", 1), ("depth", None), ("curv", None),
    ]
    present = tuple(g.get(n) is not None for n, _ in names)

    kernel = functools.partial(
        _frame_bwd_kernel,
        counts=counts, nK=nK, gloss=config.gloss, width=W,
        height=config.height,  # full-image NDC/seed mapping, even for tiles
        fov=config.fov, block_rows=block_rows, block_cols=block_cols,
        soft_beta=float(config.soft_shadows), smp=fk.smp_of(config),
        decorrelate=bool(config.decorrelate_samples),
        biased=bool(config.biased), present=present,
    )

    def pad(a):
        if a.shape == (Hp, Wp):
            return a
        return jnp.pad(a, ((0, Hp - a.shape[0]), (0, Wp - a.shape[1])))

    # Present cotangent planes in forward output order, zero-padded.
    g_planes = [
        pad(g[n] if c is None else g[n][..., c])
        for (n, c), p in zip(names, present) if p
    ]

    small = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    img = lambda: pl.BlockSpec(
        (block_rows, block_cols), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    acc = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    out_shape = [jax.ShapeDtypeStruct(ops[k].shape, jnp.float32) for k in DIFF_IDX]
    out_specs = [acc(ops[k].shape) for k in DIFF_IDX]

    return pl.pallas_call(
        kernel,
        grid=(Hp // block_rows, Wp // block_cols),
        in_specs=[small() for _ in range(21)] + [img() for _ in g_planes],
        out_specs=out_specs,
        out_shape=out_shape,
        # The transposed block jaxpr keeps forward residuals live through
        # the reverse sweep; give it headroom beyond the 16 MB default.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024
        ),
        interpret=interpret,
    )(*ops, jnp.asarray(row_base, jnp.int32).reshape(1, 1), *g_planes)


def assemble_grads(scene, camera, grads, light_index: int):
    """DIFF_IDX-ordered gradient tables → (d_scene, d_camera) pytrees.

    Shared by the custom-VJP backward below and the fused loss kernel
    (ops/loss_kernel.py)."""
    (d_planes, d_spheres, d_boxes, d_lc, d_light, d_s0, d_s1,
     d_ac, d_as, d_em, d_ec, d_es, d_cam, d_or) = grads
    # Crop gradients of dummy-padded zero-row tables (small_operands).
    d_planes = d_planes[: scene.planes.shape[0]]
    d_spheres = d_spheres[: scene.spheres.shape[0]]
    d_boxes = d_boxes[: scene.boxes.shape[0]]
    # scene.light is spheres[light_index]: fold its cotangent back.
    d_spheres = d_spheres.at[light_index].add(d_light.reshape(4))
    mats = scene.materials
    d_mats = mats.replace(
        s0=d_s0.reshape(-1), s1=d_s1.reshape(-1),
        freq=jnp.zeros_like(mats.freq),
        alb_const=d_ac, alb_scale=d_as, emission=d_em,
        en_const=d_ec, en_scale=d_es,
        bsdf=None if mats.bsdf is None else _f0(mats.bsdf),
        ior=None if mats.ior is None else jnp.zeros_like(mats.ior),
    )
    d_scene = scene.replace(
        planes=d_planes, plane_ids=_f0(scene.plane_ids),
        spheres=d_spheres, sphere_ids=_f0(scene.sphere_ids),
        boxes=d_boxes, box_ids=_f0(scene.box_ids),
        light_color=d_lc.reshape(3), materials=d_mats,
    )
    d_camera = camera.replace(loc=d_cam.reshape(3), orient=d_or.reshape(2))
    return d_scene, d_camera


@functools.lru_cache(maxsize=64)
def _make_diff_fn(config: RenderConfig, light_index: int, interpret: bool,
                  rows: int | None = None):
    @jax.custom_vjp
    def fwd(scene, camera, frame, row_base):
        return fk.frame_forward_pallas(
            scene, camera, frame, config, interpret=interpret,
            row_base=row_base, rows=rows,
        )

    def fwd_fwd(scene, camera, frame, row_base):
        # symbolic_zeros=True wraps every input leaf in CustomVJPPrimal.
        unwrap = lambda t: jax.tree_util.tree_map(lambda p: p.value, t)
        scene, camera, frame, row_base = (
            unwrap(scene), unwrap(camera), unwrap(frame), unwrap(row_base)
        )
        return (
            fwd(scene, camera, frame, row_base),
            (scene, camera, frame, row_base),
        )

    def fwd_bwd(res, g):
        from jax.custom_derivatives import SymbolicZero

        scene, camera, frame, row_base = res
        # Output planes the loss provably never touched arrive as
        # SymbolicZero: map them to None so frame_backward_pallas drops
        # their backward chains statically (e.g. depth/curv in image-only
        # losses — the whole primary-intersect/curvature backward).
        g = {
            k: (None if isinstance(v, SymbolicZero) else v)
            for k, v in g.items()
        }
        grads = frame_backward_pallas(
            scene, camera, frame, g, config, interpret=interpret,
            row_base=row_base, rows=rows,
        )
        d_scene, d_camera = assemble_grads(scene, camera, grads, light_index)
        return d_scene, d_camera, _f0(frame), _f0(row_base)

    fwd.defvjp(fwd_fwd, fwd_bwd, symbolic_zeros=True)
    return fwd


def frame_forward(
    scene: Scene,
    camera,
    frame,
    config: RenderConfig,
    interpret: bool = False,
    row_base=0,
    rows: int | None = None,
):
    """Differentiable fused forward: identical outputs (and cost) to
    `frame_kernel.frame_forward_pallas`, with the recompute backward above.
    `row_base`/`rows` select the per-device row tile of the sharded trainer
    (parallel/shard.py); row_base may be traced (axis_index·rows), rows is
    static. Tile gradients are partial sums over the tile's pixels.
    """
    fn = _make_diff_fn(
        config, int(scene.light_index), bool(interpret), rows
    )
    return fn(scene, camera, frame, jnp.asarray(row_base, jnp.int32))
