"""Multi-chip sharding on the virtual 8-device CPU mesh: sharded render must
equal unsharded, the sharded train step must run, and the driver dryrun must
pass."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kylespathtracer_tpu.parallel import mesh as mesh_mod
from kylespathtracer_tpu.render.camera import Camera
from kylespathtracer_tpu.render.pipeline import init_history, render_frame
from kylespathtracer_tpu.scene import default_scene
from kylespathtracer_tpu.utils.config import RenderConfig


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_unsharded():
    cfg = RenderConfig(width=64, height=32)
    scene = default_scene()
    cam = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
    hist = init_history(cfg, cam)
    frame = jnp.asarray(0, jnp.int32)

    img_ref, hist_ref = render_frame(scene, cam, hist, frame, cfg)

    mesh = mesh_mod.make_mesh(8)
    hist_sh = mesh_mod.shard_image_pytree(hist, mesh, cfg.height)
    fn = jax.jit(render_frame, static_argnames=("config",))
    img_sh, hist_sh2 = fn(scene, cam, hist_sh, frame, cfg)

    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hist_sh2.diffuse.rgb), np.asarray(hist_ref.diffuse.rgb), atol=1e-4
    )


def test_sharded_multiframe_reprojection():
    """Reprojection gathers cross shard boundaries; GSPMD must handle them."""
    cfg = RenderConfig(width=64, height=32)
    scene = default_scene()
    mesh = mesh_mod.make_mesh(8)
    fn = jax.jit(render_frame, static_argnames=("config",))

    cam0 = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
    cam1 = Camera.create(loc=(3.1, 2.05, -3.0), orient=(0.02, 0.72))

    hist = init_history(cfg, cam0)
    hist_sh = mesh_mod.shard_image_pytree(hist, mesh, cfg.height)
    img_r, hist_r = render_frame(scene, cam0, hist, jnp.asarray(0, jnp.int32), cfg)
    img_s, hist_s = fn(scene, cam0, hist_sh, jnp.asarray(0, jnp.int32), cfg)
    img_r2, _ = render_frame(scene, cam1, hist_r, jnp.asarray(1, jnp.int32), cfg)
    img_s2, _ = fn(scene, cam1, hist_s, jnp.asarray(1, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(img_s2), np.asarray(img_r2), atol=1e-4)


def test_driver_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_driver_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_shard_map_tiled_matches_reference():
    """Explicit shard_map tiles (all_gather history + per-device row blocks)
    must match the unsharded render over two frames."""
    from kylespathtracer_tpu.parallel import shard as shard_mod

    cfg = RenderConfig(width=64, height=32)
    scene = default_scene()
    mesh = mesh_mod.make_mesh(8)
    cam0 = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
    cam1 = Camera.create(loc=(3.1, 2.05, -3.0), orient=(0.02, 0.72))
    hist = init_history(cfg, cam0)

    img_r, hist_r = render_frame(scene, cam0, hist, jnp.asarray(0, jnp.int32), cfg)
    img_t, hist_t = shard_mod.render_frame_tiled(
        scene, cam0, hist, jnp.asarray(0, jnp.int32), cfg, mesh
    )
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_r), atol=1e-5)

    img_r2, _ = render_frame(scene, cam1, hist_r, jnp.asarray(1, jnp.int32), cfg)
    img_t2, _ = shard_mod.render_frame_tiled(
        scene, cam1, hist_t, jnp.asarray(1, jnp.int32), cfg, mesh
    )
    np.testing.assert_allclose(np.asarray(img_t2), np.asarray(img_r2), atol=1e-4)


def test_shard_map_train_step():
    import optax

    from kylespathtracer_tpu.diff import inverse
    from kylespathtracer_tpu.parallel import shard as shard_mod
    from kylespathtracer_tpu.scene.scene import sphere_scene

    cfg = RenderConfig(width=64, height=32)
    mesh = mesh_mod.make_mesh(8)
    cam = Camera.create(loc=(0.0, 2.0, 0.0), orient=(0.0, 0.0))
    scene = sphere_scene([[0.0, 1.0, 6.0]], [1.0], [[0.6, 0.3, 0.2]])
    params = inverse.extract_params(scene)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    target = mesh_mod.shard_image_pytree(
        jnp.zeros((cfg.height, cfg.width, 3)), mesh, cfg.height
    )
    p2, os2, loss = shard_mod.train_step_tiled(
        params, opt_state, opt, scene, cam, target, jnp.asarray(0, jnp.int32),
        cfg, mesh,
    )
    assert np.isfinite(float(loss))
    # The update actually changed the parameters.
    assert not np.allclose(np.asarray(p2["spheres"]), np.asarray(params["spheres"]))


@pytest.mark.slow
def test_tiled_fused_matches_unsharded():
    """The production multi-chip path — the fully fused temporal kernel
    (ops/frame_hist.py) running on each device's 8-row tile behind the
    ppermute history halo — reproduces the unsharded fused frame over a
    moving 2-frame sequence. (Slow: interpret-mode pallas on the CPU mesh.)
    The warning filter turns the exact-gather fallback into a failure: this
    test must witness the frame_hist tile path, not the fallback."""
    import warnings

    from kylespathtracer_tpu.parallel import shard as shard_mod

    cfg = RenderConfig(width=64, height=64, pipeline="fused")
    mesh = mesh_mod.make_mesh(8)
    cams = [
        Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7)),
        Camera.create(loc=(3.02, 2.0, -3.01), orient=(0.001, 0.7)),
    ]

    hist = init_history(cfg, cams[0])
    img_ref = None
    for i, cam in enumerate(cams):
        img_ref, hist = render_frame(
            default_scene(), cam, hist, jnp.asarray(i, jnp.int32), cfg
        )

    hist = init_history(cfg, cams[0])
    img_t = None
    with warnings.catch_warnings():
        warnings.filterwarnings("error", message="fused tiled path")
        for i, cam in enumerate(cams):
            img_t, hist = shard_mod.render_frame_tiled(
                default_scene(), cam, hist, jnp.asarray(i, jnp.int32),
                cfg, mesh,
            )
    np.testing.assert_allclose(
        np.asarray(img_t), np.asarray(img_ref), atol=1e-5
    )
