"""Real-`pallas_call` coverage in the default gate (round-4 verdict item).

Each kernel family runs its actual `pl.pallas_call` (interpret mode) at a
tiny multi-block resolution and is checked against its jnp twin — so a
BlockSpec/operand-order/grid regression (round 2's failure class) is
caught by `pytest` without `-m slow`. Sizes are chosen so the whole file
stays under ~2 min on the 2-core CI box; the heavyweight interpret tests
(backward kernel, full-frame parity at larger sizes, multihost) remain in
`-m slow` (~40 min total, documented in pyproject.toml).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kylespathtracer_tpu.ops import frame_kernel as fk
from kylespathtracer_tpu.ops import reproject_kernel as rk
from kylespathtracer_tpu.render import reproject as rep_mod
from kylespathtracer_tpu.render.camera import Camera, ray_dirs
from kylespathtracer_tpu.render.passes import Channel
from kylespathtracer_tpu.scene import default_scene
from kylespathtracer_tpu.utils.config import RenderConfig

SCENE = default_scene()
CAM = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
FRAME = jnp.asarray(0, jnp.int32)


def test_geometry_kernel_pallas_call():
    """Geometry kernel (2 row blocks) == the jnp twin's geometry planes."""
    cfg = RenderConfig(width=128, height=64)
    out = fk.geometry_pass_pallas(SCENE, CAM, FRAME, cfg, block_rows=32,
                                  interpret=True)
    ref = fk.frame_forward_jnp(SCENE, CAM, FRAME, cfg)
    assert (np.asarray(out["oid"]) == np.asarray(ref["oid"])).all()
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["curv"]), np.asarray(ref["curv"]), atol=1e-6
    )


def test_frame_kernel_pallas_call():
    """Fused forward kernel (2 row blocks) == frame_forward_jnp."""
    cfg = RenderConfig(width=128, height=16)
    out = fk.frame_forward_pallas(SCENE, CAM, FRAME, cfg, block_rows=8,
                                  interpret=True)
    ref = fk.frame_forward_jnp(SCENE, CAM, FRAME, cfg)
    for k in ("add_d", "add_s", "alb", "ene", "depth", "curv"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), atol=2e-5, err_msg=k
        )
    assert (np.asarray(out["oid"]) == np.asarray(ref["oid"])).all()


def test_reproject_kernel_pallas_call():
    """Windowed reprojection (2 row blocks + halo) == the exact XLA gather
    for sub-window camera motion on real hit geometry."""
    W, H = 128, 16
    cfg = RenderConfig(width=W, height=H)
    gb = fk.frame_forward_jnp(SCENE, CAM, FRAME, cfg)
    rd = ray_dirs(CAM, W, H, cfg.fov)
    hl = CAM.loc + rd * gb["depth"][..., None]
    ho = gb["oid"]

    rng = np.random.default_rng(0)
    ch = Channel(
        rgb=jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32),
        cnt=jnp.asarray(rng.integers(1, 5, (H, W)).astype(np.float32)),
        oid=ho,
    )
    prev = CAM.replace(
        loc=CAM.loc + jnp.asarray([0.002, -0.001, 0.001], jnp.float32),
        orient=CAM.orient + jnp.asarray([1e-4, -2e-4], jnp.float32),
    )
    (rgb_k, cnt_k), _ = rk.reproject_pallas(
        prev, hl, hl, ho, ch, ch, cfg.fov, window=4, block_rows=8,
        interpret=True,
    )
    rgb_x, cnt_x = rep_mod.reproject(
        prev.loc, prev.orient, hl, ho, ch.rgb, ch.cnt, ch.oid, cfg.fov
    )
    np.testing.assert_allclose(
        np.asarray(rgb_k), np.asarray(rgb_x), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cnt_k), np.asarray(cnt_x), atol=1e-4
    )


@pytest.mark.slow
def test_loss_kernel_pallas_call():
    """The fused loss+gradient kernel (2-block interpret grid) returns the
    jnp twin's MSE loss value and scene gradients — validates the in-kernel
    composite, target-plane BlockSpecs, the (1,1) loss accumulator and the
    cross-block gradient accumulation. slow: interpret-mode evaluation of
    the vjp'd block function runs minutes on the CI box (same cost class as
    test_frame_grad's slow backward test — the kernel body is frame_block +
    jax.vjp, far beyond the small-test budget); the loss kernel's MATH is
    covered fast by tests/test_loss_kernel.py."""
    from kylespathtracer_tpu.ops import loss_kernel as lk

    H, W = 16, 128
    cfg = RenderConfig(width=W, height=H, no_history=True, soft_shadows=0.05)
    target = jnp.full((H, W, 3), 0.3, jnp.float32)
    lval, (d_scene, _) = lk.loss_and_grad(
        SCENE, CAM, FRAME, cfg, target=target, interpret=True
    )

    def loss_jnp(scene):
        out = fk.frame_forward_jnp(scene, CAM, FRAME, cfg)
        img = lk._composite_planes(
            tuple(out["alb"][..., c] for c in range(3)),
            tuple(out["ene"][..., c] for c in range(2)),
            tuple(out["add_d"][..., c] for c in range(3)),
            tuple(out["add_s"][..., c] for c in range(3)),
            cfg.brightness,
        )
        acc = jnp.float32(0.0)
        for c in range(3):
            acc = acc + jnp.sum((img[c] - target[..., c]) ** 2)
        return acc / float(H * W * 3)

    v_ref = loss_jnp(SCENE)
    np.testing.assert_allclose(float(lval), float(v_ref), rtol=1e-5)
    g_ref = jax.grad(loss_jnp, allow_int=True)(SCENE)
    for name in ("planes", "spheres", "light_color"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(d_scene, name))
        np.testing.assert_allclose(
            b, a, atol=1e-4 * (np.abs(a).max() + 1e-6), err_msg=name
        )


def test_path_kernel_pallas_call():
    """Wavefront path kernel == the lax.scan integrator at depth 2."""
    from kylespathtracer_tpu.render import wavefront as wf

    cfg_p = RenderConfig(width=128, height=16, spp=1, max_depth=2,
                         path_backend="pallas")
    cfg_x = RenderConfig(width=128, height=16, spp=1, max_depth=2,
                         path_backend="xla")
    img_p = wf.render_pathtraced(SCENE, CAM, cfg_p, FRAME)
    img_x = wf.render_pathtraced(SCENE, CAM, cfg_x, FRAME)
    d = np.abs(np.asarray(img_p) - np.asarray(img_x))
    assert np.isfinite(np.asarray(img_p)).all()
    assert np.median(d) < 1e-5
    assert (d > 3e-2).mean() < 0.02
