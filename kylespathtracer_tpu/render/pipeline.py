"""The frame pipeline: a pure function under jit.

The reference's four GL draw calls per frame (main.cpp:344-350) become

    render_frame(scene, camera, history, frame, config)
        → (image, new_history)

with all state (history buffers, previous camera) loop-carried in a pytree —
no texture feedback, no pixel-smuggled camera (common.glsl:643-647).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.struct

from kylespathtracer_tpu.render import composite as comp_mod
from kylespathtracer_tpu.render import gbuffer as gb_mod
from kylespathtracer_tpu.render.camera import Camera
from kylespathtracer_tpu.render.passes import Channel, shade_passes
from kylespathtracer_tpu.scene.types import Scene
from kylespathtracer_tpu.utils.config import RenderConfig


@flax.struct.dataclass
class History:
    diffuse: Channel
    specular: Channel
    camera: Camera  # the camera the buffers were rendered with

    @classmethod
    def zeros(cls, config: RenderConfig, camera: Camera) -> "History":
        return cls(
            diffuse=Channel.zeros(config.height, config.width),
            specular=Channel.zeros(config.height, config.width),
            camera=camera,
        )


def init_history(config: RenderConfig, camera: Camera | None = None) -> History:
    return History.zeros(config, camera or Camera.create())


def render_frame(
    scene: Scene,
    camera: Camera,
    history: History,
    frame: jnp.ndarray,
    config: RenderConfig,
) -> tuple[jnp.ndarray, History]:
    """One full frame: geometry → diffuse → specular → composite.

    (reference frame loop: main.cpp:344-350)
    """
    if config.pipeline == "fused":
        # Honors the full quality config: smp_* loops and the unbiased
        # ground-truth estimators run in-kernel (biased=False switches
        # frame_block to shade_kernel._shade_core_unbiased); unequal smp_*
        # counts raise ValueError (frame_kernel.smp_of) — the fused path
        # never silently diverges from the config.
        return render_frame_fused(scene, camera, history, frame, config)
    gb = gb_mod.geometry_pass(scene, camera, config)
    d, s = shade_passes(
        scene, config, gb, camera, history.camera,
        history.diffuse, history.specular, frame,
    )
    image = comp_mod.composite(scene, config, gb, camera, d, s)
    return image, History(diffuse=d, specular=s, camera=camera)


def render_frame_fused(
    scene: Scene,
    camera: Camera,
    history: History,
    frame: jnp.ndarray,
    config: RenderConfig,
) -> tuple[jnp.ndarray, History]:
    """The fast-path frame: one fused Pallas kernel (raygen + intersect +
    normals + dual-MIS shade + primary material) plus the XLA reprojection
    gather and composite. Numerically equivalent to the unfused frame with
    intersect_mode="analytic", normal_mode="analytic". Differentiable: the
    kernel carries a custom VJP whose backward is a second Pallas kernel
    (ops/frame_grad.py) — gradients no longer need the slow XLA pipeline."""
    import jax as _jax

    from kylespathtracer_tpu.core import gmath
    from kylespathtracer_tpu.ops import frame_grad as fg
    from kylespathtracer_tpu.render import camera as cam_mod
    from kylespathtracer_tpu.render import reproject as rep_mod
    from kylespathtracer_tpu.render.passes import (
        Channel,
        _temporal_clamp,
        count_floor as _count_floor,
    )

    interpret = _jax.default_backend() != "tpu"

    if not config.no_history and config.reproject_backend == "window":
        if config.temporal_fusion == "mono":
            # Everything in one kernel (ops/frame_hist.py): shade +
            # windowed reprojection + velocity clamp + accumulate, no
            # separate launches. Measured r05: the split below is ~20%
            # faster (see utils/config.temporal_fusion); kept as the
            # single-launch option. Forward-only, like the window
            # reprojection it absorbs (the differentiable path is
            # no_history below).
            from kylespathtracer_tpu.ops import frame_hist as fh

            o = fh.frame_hist_pallas(
                scene, camera, history.camera,
                history.diffuse, history.specular,
                frame, config, interpret=interpret,
            )
            d = Channel(rgb=o["d_rgb"], cnt=o["d_cnt"], oid=o["oid"])
            s = Channel(rgb=o["s_rgb"], cnt=o["s_cnt"], oid=o["oid"])
            image = comp_mod.composite_from(o["alb"], o["ene"], d, s, config)
            return image, History(diffuse=d, specular=s, camera=camera)

        # temporal_fusion == "split" (default, fastest measured): the shade
        # kernel on narrow column blocks + ONE windowed-reprojection launch
        # per channel set (ops/reproject_kernel.py) + the XLA clamp/
        # accumulate tail (which fuses into the composite). Forward-only.
        rd = cam_mod.ray_dirs(camera, config.width, config.height, config.fov)
        return split_temporal_frame(
            scene, camera, history, frame, config, interpret, rd
        )

    out = fg.frame_forward(scene, camera, frame, config, interpret=interpret)
    ho = out["oid"]

    if config.no_history:
        # Fresh-history single-frame render (the differentiable single-frame
        # forward): reprojecting an all-zero history is pure waste — skip the
        # gather and the temporal clamp (numerically identical; passes.py).
        ones = jnp.ones(ho.shape, jnp.float32)
        d = Channel(rgb=out["add_d"], cnt=ones, oid=ho)
        s = Channel(rgb=out["add_s"], cnt=ones, oid=ho)
        image = comp_mod.composite_from(out["alb"], out["ene"], d, s, config)
        return image, History(diffuse=d, specular=s, camera=camera)

    # Hit point + curvature-pushed specular anchor (specular.frag:45-49).
    rd = cam_mod.ray_dirs(camera, config.width, config.height, config.fov)
    hl = camera.loc + rd * out["depth"][..., None]
    light_dist = gmath.length(hl - scene.light[:3])
    fac = gmath.EPS / jnp.sqrt(jnp.maximum(gmath.EPS, out["curv"]))
    sl = hl + rd * (light_dist * fac)[..., None]

    # reproject_backend == "xla": exact arbitrary-motion gather (slow on
    # TPU, differentiable; the "window" backend returned above).
    vv = gmath.length(camera.loc - history.camera.loc)
    prev = history.camera
    rep_rgb_d, rep_cnt_d = rep_mod.reproject(
        prev.loc, prev.orient, hl, ho,
        history.diffuse.rgb, history.diffuse.cnt, history.diffuse.oid,
        config.fov,
    )
    rep_rgb_s, rep_cnt_s = rep_mod.reproject(
        prev.loc, prev.orient, sl, ho,
        history.specular.rgb, history.specular.cnt, history.specular.oid,
        config.fov,
    )
    rep_cnt_d = _count_floor(rep_cnt_d)
    rep_cnt_s = _count_floor(rep_cnt_s)
    rep_rgb_d, rep_cnt_d = _temporal_clamp(rep_rgb_d, rep_cnt_d, vv, config)
    rep_rgb_s, rep_cnt_s = _temporal_clamp(rep_rgb_s, rep_cnt_s, vv, config)

    d = Channel(rgb=rep_rgb_d + out["add_d"], cnt=rep_cnt_d + 1.0, oid=ho)
    s = Channel(rgb=rep_rgb_s + out["add_s"], cnt=rep_cnt_s + 1.0, oid=ho)
    image = comp_mod.composite_from(out["alb"], out["ene"], d, s, config)
    return image, History(diffuse=d, specular=s, camera=camera)


def split_temporal_frame(
    scene: Scene,
    camera: Camera,
    prev_hist: History,
    frame,
    config: RenderConfig,
    interpret: bool,
    rd,  # ray dirs for the rendered rows (full frame or tile window)
    row_base=0,
    rows: int | None = None,
    hist_halo: int = 0,
):
    """The split temporal-frame composition (temporal_fusion="split"):
    shade kernel + one windowed-reprojection launch per channel set + XLA
    count-floor/velocity-clamp/accumulate + ACES composite.

    ONE implementation for both the single-chip full frame (rows=None) and
    the sharded per-device tile (parallel/shard.py passes row_base/rows/
    hist_halo and a halo'd history window) — the knife-edge divergence
    class this repo has already hit once (count_floor) comes from the same
    math living in two places, so the tiled renderer and the benchmarked
    pipeline share this body. Forward-only, like the reprojection kernel.
    """
    from kylespathtracer_tpu.core import gmath as _gmath
    from kylespathtracer_tpu.ops import frame_kernel as fk
    from kylespathtracer_tpu.ops import reproject_kernel as rk
    from kylespathtracer_tpu.render.passes import (
        _temporal_clamp,
        count_floor,
    )

    tile = rows is not None
    out = fk.frame_forward_pallas(
        scene, camera, frame, config, interpret=interpret,
        row_base=row_base, rows=rows,
    )
    hl = camera.loc + rd * out["depth"][..., None]
    light_dist = _gmath.length(hl - scene.light[:3])
    fac = _gmath.EPS / jnp.sqrt(jnp.maximum(_gmath.EPS, out["curv"]))
    sl = hl + rd * (light_dist * fac)[..., None]
    vv = _gmath.length(camera.loc - prev_hist.camera.loc)
    (rgb_d, cnt_d), (rgb_s, cnt_s) = rk.reproject_pallas(
        prev_hist.camera, hl, sl, out["oid"],
        prev_hist.diffuse, prev_hist.specular, config.fov,
        window=config.reproject_window, block_rows=8, interpret=interpret,
        image_height=config.height if tile else None,
        row_base=row_base, hist_halo=hist_halo,
    )

    def accum(rgb, cnt, add):
        cnt = count_floor(cnt)
        rgb, cnt = _temporal_clamp(rgb, cnt, vv, config)
        return Channel(rgb=rgb + add, cnt=cnt + 1.0, oid=out["oid"])

    d = accum(rgb_d, cnt_d, out["add_d"])
    s = accum(rgb_s, cnt_s, out["add_s"])
    image = comp_mod.composite_from(out["alb"], out["ene"], d, s, config)
    return image, History(diffuse=d, specular=s, camera=camera)


def render_image(
    scene: Scene,
    camera: Camera,
    config: RenderConfig,
    frames: int = 1,
    history: History | None = None,
):
    """Convenience: render `frames` frames with a static camera, return the
    last image (temporal accumulation warms up over the sequence)."""
    if history is None:
        history = init_history(config, camera)

    fn = jax.jit(render_frame, static_argnames=("config",))

    image = None
    for i in range(frames):
        image, history = fn(scene, camera, history, jnp.asarray(i, jnp.int32), config)
    return image, history


def render_sequence(
    scene: Scene,
    cameras: Camera,  # stacked pytree: leaves have leading axis [T]
    history: History,
    config: RenderConfig,
    start_frame: int = 0,
):
    """Scan over an animated camera path; returns (images[T,H,W,3], history).

    The whole sequence compiles to a single XLA while-loop — the TPU analog
    of the reference's 60 Hz main loop (main.cpp:328-357)."""

    def step(hist, xs):
        cam, idx = xs
        img, hist = render_frame(scene, cam, hist, idx, config)
        return hist, img

    idxs = start_frame + jnp.arange(
        jax.tree_util.tree_leaves(cameras)[0].shape[0], dtype=jnp.int32
    )
    history, images = jax.lax.scan(step, history, (cameras, idxs))
    return images, history
