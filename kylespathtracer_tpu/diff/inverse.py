"""Inverse rendering: gradient descent on scene parameters.

The capability the reference lacks entirely and BASELINE.json demands:
pixel gradients flow through composite → MIS shading → intersection (via the
IFT backward in scene/sdf.py) to sphere positions, radii and albedos; Adam
recovers a scene from target images. Multi-chip: shard the pixel rows with
`parallel.mesh`, jit the same `train_step`, and GSPMD all-reduces the scene
gradients over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from kylespathtracer_tpu.render.camera import Camera
from kylespathtracer_tpu.render.pipeline import init_history, render_frame
from kylespathtracer_tpu.scene.types import Scene
from kylespathtracer_tpu.utils.config import RenderConfig

Params = dict[str, Any]


def extract_params(scene: Scene, keys=("spheres", "alb_const")) -> Params:
    """Pull the trainable leaves out of a scene."""
    out: Params = {}
    if "spheres" in keys:
        out["spheres"] = scene.spheres
    if "planes" in keys:
        out["planes"] = scene.planes
    if "alb_const" in keys:
        out["alb_const"] = scene.materials.alb_const
    if "light_color" in keys:
        out["light_color"] = scene.light_color
    return out


def apply_params(scene: Scene, params: Params) -> Scene:
    mats = scene.materials
    if "alb_const" in params:
        mats = mats.replace(alb_const=params["alb_const"])
    kw = {"materials": mats}
    if "spheres" in params:
        kw["spheres"] = params["spheres"]
    if "planes" in params:
        kw["planes"] = params["planes"]
    if "light_color" in params:
        kw["light_color"] = params["light_color"]
    return scene.replace(**kw)


def render_once(scene: Scene, camera: Camera, config: RenderConfig,
                frame: jnp.ndarray) -> jnp.ndarray:
    """Single-frame render (fresh history) — the differentiable forward.

    Uses the `no_history` fast path: reprojecting an all-zero history is
    pure waste (~0.5 s/frame at 1080p), so the gather is skipped; the result
    is numerically identical."""
    import dataclasses

    config = dataclasses.replace(config, no_history=True)
    history = init_history(config, camera)
    image, _ = render_frame(scene, camera, history, frame, config)
    return image


@partial(jax.jit, static_argnames=("config",))
def loss_fn(params: Params, scene: Scene, camera: Camera,
            target: jnp.ndarray, frame: jnp.ndarray,
            config: RenderConfig) -> jnp.ndarray:
    """MSE in tonemapped sRGB space against the target image."""
    img = render_once(apply_params(scene, params), camera, config, frame)
    return jnp.mean((img - target) ** 2)


def fit(
    scene0: Scene,
    target: jnp.ndarray,
    camera: Camera,
    config: RenderConfig,
    keys=("spheres", "alb_const"),
    steps: int = 200,
    lr: float = 2e-2,
    vary_seed: bool = True,
):
    """Adam-descend scene params to match `target`; returns (scene, losses)."""
    params = extract_params(scene0, keys)
    # Cosine-decayed Adam: large early steps to cross plateaus, small late
    # steps so the Monte-Carlo gradient noise (vary_seed) averages out.
    opt = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1), alpha=0.05))
    opt_state = opt.init(params)

    # The whole optimization is ONE lax.scan under ONE jit: a per-step
    # Python loop pays a device round trip per step (dominant on a tunneled
    # TPU) and a separate compile for the step; the scan compiles once and
    # runs device-resident end to end.
    @jax.jit
    def run(params, opt_state, scene0, camera, target):
        def body(carry, i):
            params, opt_state = carry
            frame = i if vary_seed else jnp.asarray(0, jnp.int32)
            loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(
                params, scene0, camera, target, frame, config
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps, dtype=jnp.int32)
        )
        return params, losses

    params, losses = run(params, opt_state, scene0, camera, target)
    losses = [float(l) for l in jax.device_get(losses)]
    return apply_params(scene0, params), losses


def run_recovery(
    num_spheres: int = 10,
    steps: int = 200,
    width: int = 128,
    height: int = 96,
    lr: float = 1e-2,
    seed: int = 0,
    log_every: int = 0,
    perturb: float = 0.35,
    soft_shadows: float = 0.05,
):
    """The BASELINE north-star demo: recover an N-sphere scene's positions,
    radii and albedos from rendered targets, starting from a perturbed copy.

    Returns a dict of initial/final loss and parameter errors.
    """
    import numpy as np

    from kylespathtracer_tpu.scene.scene import sphere_scene

    rng = np.random.default_rng(seed)
    centers = np.stack(
        [
            rng.uniform(-4.0, 4.0, num_spheres),
            rng.uniform(0.6, 3.0, num_spheres),
            rng.uniform(4.0, 10.0, num_spheres),
        ],
        axis=-1,
    )
    radii = rng.uniform(0.4, 0.9, num_spheres)
    albedos = rng.uniform(0.2, 0.9, (num_spheres, 3))

    scene_gt = sphere_scene(centers, radii, albedos)
    # Soft shadows give the occluders silhouette gradients (diff/softvis.py);
    # the target is rendered with the same β so recovery is self-consistent.
    config = RenderConfig(width=width, height=height, soft_shadows=soft_shadows)
    camera = Camera.create(loc=(0.0, 2.5, -2.0), orient=(0.15, 0.0))
    target = render_once(scene_gt, camera, config, jnp.asarray(0, jnp.int32))

    # Perturbed start: geometry jittered, albedos reset to gray.
    scene0 = sphere_scene(
        centers + rng.normal(0, perturb, centers.shape),
        np.clip(radii + rng.normal(0, perturb * 0.3, radii.shape), 0.2, 1.2),
        np.full_like(albedos, 0.5),
    )

    fitted, losses = fit(scene0, target, camera, config, steps=steps, lr=lr)
    loss0 = losses[0]  # pre-update loss of the perturbed start
    if log_every:
        for i in range(0, len(losses), log_every):
            print(f"step {i}: loss {losses[i]:.3e}")

    gt_p = extract_params(scene_gt)
    fit_p = extract_params(fitted)
    # Ignore the light row (index 0) when scoring sphere recovery.
    err_pos = float(
        jnp.abs(fit_p["spheres"][1:, :3] - gt_p["spheres"][1:, :3]).mean()
    )
    err_rad = float(jnp.abs(fit_p["spheres"][1:, 3] - gt_p["spheres"][1:, 3]).mean())
    err_alb = float(jnp.abs(fit_p["alb_const"] - gt_p["alb_const"]).mean())
    return {
        "loss_initial": loss0,
        "loss_final": losses[-1],
        "err_position": err_pos,
        "err_radius": err_rad,
        "err_albedo": err_alb,
    }


def train_step(params, opt_state, opt, scene, camera, target, frame, config):
    """One jit-able optimization step (used by the multi-chip dryrun)."""
    loss, grads = jax.value_and_grad(loss_fn)(
        params, scene, camera, target, frame, config
    )
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
