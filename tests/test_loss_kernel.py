"""Fused loss+gradient kernel (ops/loss_kernel.py).

Fast default-suite tests exercise the kernel's MATH as plain jnp (the
composite/tonemap twin and the block loss function built on
frame_kernel.frame_block); the real `pallas_call` plumbing is validated by
the slow interpret test tests/test_pallas_small.py::
test_loss_kernel_pallas_call, on TPU by the bench, and by the
inverse-recovery run (fit() routes through the kernel when
pipeline="fused").
"""

import numpy as np
import jax
import jax.numpy as jnp

from kylespathtracer_tpu.core import color
from kylespathtracer_tpu.ops import frame_kernel as fk
from kylespathtracer_tpu.ops import loss_kernel as lk
from kylespathtracer_tpu.render import composite as comp_mod
from kylespathtracer_tpu.render.camera import Camera
from kylespathtracer_tpu.render.passes import Channel
from kylespathtracer_tpu.render.pipeline import init_history, render_frame
from kylespathtracer_tpu.scene import default_scene
from kylespathtracer_tpu.utils.config import RenderConfig

W, H = 64, 48
LOC = (3.0, 2.0, -3.0)
ORI = (0.0, 0.7)
FRAME = jnp.asarray(0, jnp.int32)


def test_composite_planes_matches_composite_from():
    """The in-kernel composite/ACES/sRGB twin reproduces
    render/composite.composite_from for the fresh-history (cnt=1) case."""
    rng = np.random.default_rng(0)
    alb = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    # Include exact zeros (the miss material row) for the sqrt guard.
    alb = alb.at[0].set(0.0)
    ene = jnp.asarray(rng.uniform(0, 1, (H, W, 2)), jnp.float32)
    add_d = jnp.asarray(rng.uniform(0, 3, (H, W, 3)), jnp.float32)
    add_s = jnp.asarray(rng.uniform(0, 3, (H, W, 3)), jnp.float32)
    cfg = RenderConfig(width=W, height=H)

    ones = jnp.ones((H, W), jnp.float32)
    oid = jnp.ones((H, W), jnp.int32)
    ref = comp_mod.composite_from(
        alb, ene,
        Channel(rgb=add_d, cnt=ones, oid=oid),
        Channel(rgb=add_s, cnt=ones, oid=oid),
        cfg,
    )
    planes = lk._composite_planes(
        tuple(alb[..., c] for c in range(3)),
        tuple(ene[..., c] for c in range(2)),
        tuple(add_d[..., c] for c in range(3)),
        tuple(add_s[..., c] for c in range(3)),
        cfg.brightness,
    )
    got = jnp.stack(planes, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def _loss_parity_case(cfg):
    """Block-loss (frame_block + in-kernel composite + MSE as plain jnp)
    vs the XLA pipeline's value_and_grad of the same loss, for `cfg`."""
    scene = default_scene()
    cam = Camera.create(loc=LOC, orient=ORI)
    target = jnp.full((H, W, 3), 0.3, jnp.float32)

    def loss_block(scene):
        out = fk.frame_forward_jnp(scene, cam, FRAME, cfg)
        img = lk._composite_planes(
            tuple(out["alb"][..., c] for c in range(3)),
            tuple(out["ene"][..., c] for c in range(2)),
            tuple(out["add_d"][..., c] for c in range(3)),
            tuple(out["add_s"][..., c] for c in range(3)),
            cfg.brightness,
        )
        acc = 0.0
        for c in range(3):
            acc = acc + jnp.sum((img[c] - target[..., c]) ** 2)
        return acc / float(H * W * 3)

    def loss_pipe(scene):
        hist = init_history(cfg, cam)
        img, _ = render_frame(scene, cam, hist, FRAME, cfg)
        return jnp.mean((img - target) ** 2)

    v_b, g_b = jax.jit(
        jax.value_and_grad(loss_block, allow_int=True)
    )(scene)
    v_p, g_p = jax.jit(
        jax.value_and_grad(loss_pipe, allow_int=True)
    )(scene)
    np.testing.assert_allclose(float(v_b), float(v_p), rtol=1e-5)
    for name in ("spheres", "planes", "light_color"):
        a = np.asarray(getattr(g_p, name))
        b = np.asarray(getattr(g_b, name))
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, err_msg=name)


def test_block_loss_grads_match_pipeline():
    _loss_parity_case(
        RenderConfig(width=W, height=H, no_history=True, soft_shadows=0.05)
    )


def test_block_loss_grads_production_inverse_config():
    """soft_shadows>0 AND smp>1 combined — the configuration the production
    inverse fit actually runs (diff/inverse.py uses a soft-shadow beta
    schedule; multi-sample steps share its kernel). Round-4 verdict item 5:
    the parity suite previously never combined the two knobs."""
    _loss_parity_case(
        RenderConfig(
            width=W, height=H, no_history=True, soft_shadows=0.05,
            smp_direct_lambert=2, smp_lambert_surface_lambert=2,
            smp_lambert_surface_phong=2, smp_direct_phong=2,
            smp_phong_surface_lambert=2, smp_phong_surface_phong=2,
        )
    )
