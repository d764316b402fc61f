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

# Frame index where target-realization seeds start (seed-paired fitting —
# see `fit`): far from the 0..steps frames ordinary fitting consumes.
SEED_BASE = 1000


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
    """MSE in tonemapped sRGB space against the target image.

    Multi-view: a 4-D target [V,H,W,3] with a stacked camera pytree (leaves
    with leading [V]) averages the per-view MSE — silhouette/depth
    ambiguities of a single view (sphere z vs radius) disappear with 2-3
    baselines."""
    sc = apply_params(scene, params)
    if target.ndim == 4:
        # Static unroll over views (V is small): keeps the fused Pallas
        # frame usable (no vmap over pallas_call / custom_vjp needed).
        losses = [
            jnp.mean(
                (
                    render_once(
                        sc, jax.tree_util.tree_map(lambda l: l[v], camera),
                        config, frame,
                    )
                    - target[v]
                ) ** 2
            )
            for v in range(int(target.shape[0]))
        ]
        return jnp.mean(jnp.stack(losses))
    img = render_once(sc, camera, config, frame)
    return jnp.mean((img - target) ** 2)


def stack_cameras(cams: list[Camera]) -> Camera:
    """List of cameras → one stacked pytree (leaves gain a leading axis)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def look_at(loc, at) -> Camera:
    """Camera at `loc` facing the point `at` (forward = rotate_xy(+z)):
    pitch = asin(d.y), yaw = atan2(d.x, d.z)."""
    import numpy as np

    d = np.asarray(at, np.float32) - np.asarray(loc, np.float32)
    d = d / max(float(np.linalg.norm(d)), 1e-8)
    return Camera.create(
        loc=loc, orient=(float(np.arcsin(d[1])), float(np.arctan2(d[0], d[2])))
    )


def fit(
    scene0: Scene,
    target: jnp.ndarray,
    camera: Camera,
    config: RenderConfig,
    keys=("spheres", "alb_const"),
    steps: int = 200,
    lr: float = 2e-2,
    vary_seed: bool = True,
    opt=None,
    opt_state=None,
    return_state: bool = False,
):
    """Adam-descend scene params to match `target`; returns (scene, losses).

    Pass `opt`/`opt_state` to continue an optimizer across calls (the β
    continuation in run_recovery): resetting Adam's moments each phase lets
    the first post-reset steps random-walk weakly-constrained parameters
    (albedo) by ~lr per step until the second moment re-calibrates."""
    params = extract_params(scene0, keys)
    if opt is None:
        # Cosine-decayed Adam: large early steps to cross plateaus, small
        # late steps so the MC gradient noise (vary_seed) averages out.
        opt = optax.adam(
            optax.cosine_decay_schedule(lr, max(steps, 1), alpha=0.05)
        )
    if opt_state is None:
        opt_state = opt.init(params)

    # The whole optimization is ONE lax.scan under ONE jit: a per-step
    # Python loop pays a device round trip per step (dominant on a tunneled
    # TPU) and a separate compile for the step; the scan compiles once and
    # runs device-resident end to end.
    # Seed-paired matching: a 5-D target [V, S, H, W, 3] holds S target
    # REALIZATIONS per view, rendered at frames SEED_BASE..SEED_BASE+S-1.
    # Step i renders with frame SEED_BASE + (i mod S) and matches the target
    # realization of the SAME seed, so at the true parameters the residual
    # is exactly zero for every seed. Matching a fixed (even averaged)
    # target with varying seeds instead makes the descent minimize
    # E[(X_θ-t)²] = (E[X_θ]-t)² + Var(X_θ): the variance-gradient term
    # pushes parameters toward low-variance configurations — measurably
    # dragging sphere positions/albedos off the optimum near sharp shadows.
    paired = target.ndim == 5
    n_seeds = int(target.shape[1]) if paired else 0

    # With the fused pipeline the whole loss+gradient step is ONE Pallas
    # kernel (ops/loss_kernel.py): forward, composite, MSE and backward in a
    # single device program — ~1.4x the two-kernel custom-VJP step and ~40x
    # the XLA pass path. The per-view MSE it computes is exactly loss_fn's.
    # KPT_FUSED_LOSS=0 forces the generic custom-VJP path (A/B debugging).
    import os as _os

    use_fused_loss = (
        config.pipeline == "fused"
        and _os.environ.get("KPT_FUSED_LOSS", "1") != "0"
    )

    def value_and_grad_step(params, scene0, camera, tgt, frame):
        if not use_fused_loss:
            return jax.value_and_grad(loss_fn, allow_int=True)(
                params, scene0, camera, tgt, frame, config
            )
        from kylespathtracer_tpu.ops import loss_kernel as lk

        sc = apply_params(scene0, params)
        views_t = [tgt] if tgt.ndim == 3 else [
            tgt[v] for v in range(int(tgt.shape[0]))
        ]
        cams = [camera] if tgt.ndim == 3 else [
            jax.tree_util.tree_map(lambda l: l[v], camera)
            for v in range(int(tgt.shape[0]))
        ]
        interpret = jax.default_backend() != "tpu"
        losses, gs = [], []
        for cam_v, tgt_v in zip(cams, views_t):
            lval, (d_scene, _) = lk.loss_and_grad(
                sc, cam_v, frame, config, target=tgt_v, interpret=interpret
            )
            losses.append(lval)
            gs.append(extract_params(d_scene, keys))
        loss = jnp.mean(jnp.stack(losses))
        grads = jax.tree_util.tree_map(
            lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *gs
        )
        return loss, grads

    @jax.jit
    def run(params, opt_state, scene0, camera, target):
        def body(carry, i):
            params, opt_state = carry
            if paired:
                s = jnp.mod(i, n_seeds)
                frame = SEED_BASE + s
                tgt = target[:, s]
            else:
                frame = i if vary_seed else jnp.asarray(0, jnp.int32)
                tgt = target
            loss, grads = value_and_grad_step(
                params, scene0, camera, tgt, frame
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps, dtype=jnp.int32)
        )
        return params, opt_state, losses

    params, opt_state, losses = run(params, opt_state, scene0, camera, target)
    losses = [float(l) for l in jax.device_get(losses)]
    fitted = apply_params(scene0, params)
    if return_state:
        return fitted, losses, opt_state
    return fitted, losses


def _param_errors(scene_gt: Scene, fitted: Scene) -> dict:
    gt_p = extract_params(scene_gt)
    fit_p = extract_params(fitted)
    # Ignore the light row (index 0) when scoring sphere recovery.
    return {
        "err_position": float(
            jnp.abs(fit_p["spheres"][1:, :3] - gt_p["spheres"][1:, :3]).mean()
        ),
        "err_radius": float(
            jnp.abs(fit_p["spheres"][1:, 3] - gt_p["spheres"][1:, 3]).mean()
        ),
        "err_albedo": float(
            jnp.abs(fit_p["alb_const"] - gt_p["alb_const"]).mean()
        ),
    }


def run_recovery(
    num_spheres: int = 10,
    steps: int = 400,
    width: int = 192,
    height: int = 128,
    lr: float = 2e-2,
    seed: int = 0,
    log_every: int = 0,
    perturb: float = 0.35,
    betas: tuple = (0.05, 0.02, 0.008, 0.003),
    views: int = 3,
    ckpt_dir: str | None = None,
    resume: bool = False,
    max_phases: int | None = None,
):
    """The BASELINE north-star demo: recover an N-sphere scene's positions,
    radii and albedos from rendered targets, starting from a perturbed copy.

    Three ingredients close the gap to "recovered" (round-2 verdict):
    * β continuation: soft-shadow smoothing (diff/softvis.py) is annealed
      over phases — wide β early crosses silhouette plateaus, small β late
      approaches the hard render, and each phase's targets are re-rendered
      at its β so the optimum of every phase is the ground-truth scene.
    * Multi-view targets: `views` cameras on an arc remove the single-view
      depth/radius ambiguity.
    * Per-phase error traces in the returned dict.

    Elastic recovery (SURVEY §5): pass `ckpt_dir` to checkpoint
    (scene, optimizer state, losses, trace) after every β phase;
    `resume=True` restores the latest phase checkpoint and continues —
    kill + resume reproduces the uninterrupted trajectory exactly (the
    scene/camera initialization is a pure function of `seed`, and the
    optimizer state round-trips bit-exactly through orbax).
    `max_phases` stops after that many phases (fault-injection hook and
    partial-run control; the return dict then has "completed_phases" <
    len(betas))."""
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

    # Cameras on an arc around the sphere cloud's center, alternating two
    # heights for vertical parallax (position-z vs radius disambiguation).
    mid = centers.mean(axis=0)
    cam_list = [
        look_at(
            (
                float(mid[0]) + 9.0 * np.sin(a),
                2.5 if i % 2 == 0 else 4.5,
                float(mid[2]) - 9.0 * np.cos(a),
            ),
            (float(mid[0]), float(mid[1]), float(mid[2])),
        )
        for i, a in enumerate(np.linspace(-0.7, 0.7, views))
    ]
    cameras = stack_cameras(cam_list)  # leading [V] axis, even for V=1

    # Perturbed start: geometry jittered, albedos reset to gray.
    scene_i = sphere_scene(
        centers + rng.normal(0, perturb, centers.shape),
        np.clip(radii + rng.normal(0, perturb * 0.3, radii.shape), 0.2, 1.2),
        np.full_like(albedos, 0.5),
    )

    frame0 = jnp.asarray(0, jnp.int32)
    # Weight steps toward the sharp-β phases: the wide-β phases only need to
    # cross silhouette plateaus; the precision comes late.
    w = np.linspace(1.0, 1.6, len(betas))
    phase_steps_all = [max(1, int(steps * wi / w.sum())) for wi in w]
    total_steps = sum(phase_steps_all)

    # ONE optimizer across all phases: per-phase Adam restarts let the first
    # post-reset steps random-walk weakly-constrained parameters (albedo
    # drifted 3x across phases before this). Global-norm clipping tames the
    # sigmoid silhouette gradient spikes at small β (grad ∝ 1/(β·t)).
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(
            optax.cosine_decay_schedule(lr, max(total_steps, 1), alpha=0.03)
        ),
    )
    opt_state = None
    # The fused Pallas pipeline carries its own backward kernel
    # (ops/frame_grad.py) — ~40x faster fwd+bwd than the XLA pass path and
    # far cheaper to compile per β phase. CPU keeps the XLA path (interpret
    # mode is too slow for a fit loop).
    pipeline = "fused" if jax.default_backend() == "tpu" else "pass"
    all_losses: list[float] = []
    trace = []

    start_phase = 0
    if resume:
        if not ckpt_dir:
            raise ValueError("resume=True requires ckpt_dir")
        import json as _json
        from pathlib import Path

        from kylespathtracer_tpu.utils import checkpoint as ckpt_mod

        # Checkpoint the trainable params, not the whole scene: zero-row
        # geometry tables (a sphere scene has no boxes) are unsaveable by
        # orbax, and the non-trainable leaves are a pure function of `seed`.
        like = {
            "params": extract_params(scene_i),
            "opt_state": opt.init(extract_params(scene_i)),
        }
        # A phase is resumable only when BOTH its orbax step dir and its
        # meta_{phase}.json sidecar exist (they are written in that order);
        # a kill between the two writes falls back to the previous complete
        # phase instead of resuming from a torn pair.
        root = Path(ckpt_dir)
        metas = {
            int(q.stem.split("_", 1)[1])
            for q in root.glob("meta_*.json")
            if q.stem.split("_", 1)[1].isdigit()
        }
        steps_avail = {
            int(q.name.split("_", 1)[1])
            for q in root.glob("step_*")
            if q.name.split("_", 1)[1].isdigit()
        }
        usable = sorted(metas & steps_avail)
        if usable:
            start_phase = usable[-1]
            _, state = ckpt_mod.restore(ckpt_dir, step=start_phase, like=like)
            scene_i = apply_params(scene_i, state["params"])
            opt_state = state["opt_state"]
            side = _json.loads(
                (root / f"meta_{start_phase}.json").read_text()
            )
            all_losses = side["losses"]
            trace = side["trace"][:start_phase]

    for phase, beta in enumerate(betas):
        if phase < start_phase:
            continue
        if max_phases is not None and phase >= max_phases:
            break
        config = RenderConfig(
            width=width, height=height, soft_shadows=float(beta),
            pipeline=pipeline,
        )
        # Seed-paired target realizations [V, S, H, W, 3] (see `fit`): step i
        # renders with the same seed as the target slice it matches, so the
        # optimum is exactly the ground-truth parameters — no Monte-Carlo
        # noise floor and no variance-gradient drift.
        n_seeds = 16

        @jax.jit
        def render_seeds(cam):
            def body(k, acc):
                img = render_once(
                    scene_gt, cam, config,
                    jnp.asarray(SEED_BASE, jnp.int32) + k,
                )
                return acc.at[k].set(img)
            z = jnp.zeros((n_seeds, height, width, 3), jnp.float32)
            return jax.lax.fori_loop(0, n_seeds, body, z)

        target = jnp.stack([
            render_seeds(jax.tree_util.tree_map(lambda l: l[v], cameras))
            for v in range(views)
        ])
        scene_i, losses, opt_state = fit(
            scene_i, target, cameras, config, steps=phase_steps_all[phase],
            opt=opt, opt_state=opt_state, return_state=True,
        )
        all_losses.extend(losses)
        errs = _param_errors(scene_gt, scene_i)
        trace.append({"beta": float(beta), "loss": losses[-1], **errs})
        if log_every:
            print(f"phase {phase} (beta={beta}): loss {losses[-1]:.3e} {errs}")

        if ckpt_dir:
            import json as _json
            from pathlib import Path

            from kylespathtracer_tpu.utils import checkpoint as ckpt_mod

            ckpt_mod.save(
                ckpt_dir, phase + 1,
                {"params": extract_params(scene_i), "opt_state": opt_state},
            )
            # Sidecar second: resume only trusts (step, meta) pairs where
            # both exist, so a kill between these writes is safe.
            (Path(ckpt_dir) / f"meta_{phase + 1}.json").write_text(
                _json.dumps({"losses": all_losses, "trace": trace})
            )

    return {
        "loss_initial": all_losses[0],
        "loss_final": all_losses[-1],
        **_param_errors(scene_gt, scene_i),
        "phases": trace,
        "completed_phases": len(trace),
        "views": views,
        "resolution": f"{width}x{height}",
        "steps": sum(phase_steps_all),
    }


def train_step(params, opt_state, opt, scene, camera, target, frame, config):
    """One jit-able optimization step (used by the multi-chip dryrun)."""
    loss, grads = jax.value_and_grad(loss_fn)(
        params, scene, camera, target, frame, config
    )
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
