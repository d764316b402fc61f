"""Differentiable fused frame (ops/frame_grad.py).

Fast default-suite tests exercise the kernel MATH through
`frame_kernel.frame_forward_jnp` — the same `frame_block` the Pallas
kernels run, evaluated as plain jnp (no interpret-mode overhead) — against
the XLA pass pipeline, forward and backward. The Pallas plumbing itself
(block specs, operand order, grid accumulation) is covered by the slow
interpret test at the bottom and by the TPU bench.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kylespathtracer_tpu.diff import inverse
from kylespathtracer_tpu.ops import frame_grad as fg
from kylespathtracer_tpu.ops import frame_kernel as fk
from kylespathtracer_tpu.render.camera import Camera
from kylespathtracer_tpu.render.pipeline import init_history, render_frame
from kylespathtracer_tpu.scene import default_scene
from kylespathtracer_tpu.utils.config import RenderConfig

W, H = 64, 48
LOC = (3.0, 2.0, -3.0)
ORI = (0.0, 0.7)
FRAME = jnp.asarray(0, jnp.int32)


def _image_from_planes(out, cfg):
    from kylespathtracer_tpu.render import composite as comp_mod
    from kylespathtracer_tpu.render.passes import Channel

    ones = jnp.ones(out["oid"].shape, jnp.float32)
    d = Channel(rgb=out["add_d"], cnt=ones, oid=out["oid"])
    s = Channel(rgb=out["add_s"], cnt=ones, oid=out["oid"])
    return comp_mod.composite_from(out["alb"], out["ene"], d, s, cfg)


def _pass_image(scene, cam, cfg, frame=FRAME):
    hist = init_history(cfg, cam)
    img, _ = render_frame(scene, cam, hist, frame, cfg)
    return img


@pytest.mark.parametrize("soft", [0.0, 0.05])
def test_frame_block_matches_pass(soft):
    """frame_block math (incl. the in-kernel soft-shadow transmittance)
    reproduces the XLA pass pipeline's single-frame image."""
    scene = default_scene()
    cam = Camera.create(loc=LOC, orient=ORI)
    cfg = RenderConfig(width=W, height=H, no_history=True, soft_shadows=soft)
    out = fk.frame_forward_jnp(scene, cam, FRAME, cfg)
    img_block = _image_from_planes(out, cfg)
    img_pass = _pass_image(scene, cam, cfg)
    d = np.abs(np.asarray(img_block) - np.asarray(img_pass))
    assert np.isfinite(np.asarray(img_block)).all()
    assert np.median(d) < 1e-5
    assert (d > 3e-2).mean() < 0.02, f"{(d > 3e-2).mean():.3%} differ"


def test_frame_block_honors_smp():
    """smp_*=2 on the fused path averages two per-strategy samples exactly
    like mis.dual_mis — fused == pass at the same quality config (the
    round-3 fused path silently rendered 1 sample whatever smp said)."""
    scene = default_scene()
    cam = Camera.create(loc=LOC, orient=ORI)
    smp2 = {f"smp_{k}": 2 for k in (
        "direct_lambert", "lambert_surface_lambert", "lambert_surface_phong",
        "direct_phong", "phong_surface_lambert", "phong_surface_phong")}
    cfg = RenderConfig(width=W, height=H, no_history=True, **smp2)
    out = fk.frame_forward_jnp(scene, cam, FRAME, cfg)
    img_block = _image_from_planes(out, cfg)
    img_pass = _pass_image(scene, cam, cfg)
    d = np.abs(np.asarray(img_block) - np.asarray(img_pass))
    assert np.median(d) < 1e-5
    assert (d > 3e-2).mean() < 0.02, f"{(d > 3e-2).mean():.3%} differ"
    # And the smp=2 image is genuinely different from smp=1 (the knob acts).
    cfg1 = RenderConfig(width=W, height=H, no_history=True)
    out1 = fk.frame_forward_jnp(scene, cam, FRAME, cfg1)
    img1 = _image_from_planes(out1, cfg1)
    assert np.abs(np.asarray(img_block) - np.asarray(img1)).max() > 1e-3


def test_fused_rejects_unequal_smp():
    """Unequal smp_* counts raise (the fused path never silently diverges
    from the quality config)."""
    scene = default_scene()
    cam = Camera.create(loc=LOC, orient=ORI)
    cfg_bad = RenderConfig(
        width=W, height=H, no_history=True, pipeline="fused",
        smp_direct_lambert=2,
    )
    hist = init_history(cfg_bad, cam)
    with pytest.raises(ValueError, match="smp"):
        render_frame(scene, cam, hist, FRAME, cfg_bad)


@pytest.mark.parametrize("smp", [1, 2])
def test_frame_block_unbiased_matches_pass(smp):
    """biased=False runs the unbiased ground-truth estimators IN-KERNEL
    (shade_kernel._shade_core_unbiased) and reproduces the pass pipeline's
    unbiased frame (common.glsl:394-415)."""
    scene = default_scene()
    cam = Camera.create(loc=LOC, orient=ORI)
    smp_kw = {f"smp_{k}": smp for k in (
        "direct_lambert", "lambert_surface_lambert", "lambert_surface_phong",
        "direct_phong", "phong_surface_lambert", "phong_surface_phong")}
    cfg = RenderConfig(
        width=W, height=H, no_history=True, biased=False, **smp_kw
    )
    out = fk.frame_forward_jnp(scene, cam, FRAME, cfg)
    img_block = _image_from_planes(out, cfg)
    cfg_pass = RenderConfig(
        width=W, height=H, no_history=True, pipeline="pass", biased=False,
        **smp_kw,
    )
    img_pass = _pass_image(scene, cam, cfg_pass)
    d = np.abs(np.asarray(img_block) - np.asarray(img_pass))
    assert np.isfinite(np.asarray(img_block)).all()
    assert np.median(d) < 1e-5
    assert (d > 3e-2).mean() < 0.02, f"{(d > 3e-2).mean():.3%} differ"


@pytest.mark.parametrize("soft", [0.05])
def test_frame_block_grads_match_xla(soft):
    """Scene-parameter gradients through frame_block (direct AD of the
    closed forms — what the backward kernel computes) agree with the XLA
    pass pipeline's gradients (IFT backward, scene/intersect.py).

    Only the soft-shadow config (the one inverse rendering uses) runs in
    the default suite — the hard-visibility gradient path is covered by
    tests/test_grad.py's finite-difference checks and the slow test below;
    each additional parametrization costs ~4 min of XLA compile on CPU."""
    scene = default_scene()
    cam = Camera.create(loc=LOC, orient=ORI)
    cfg = RenderConfig(width=W, height=H, no_history=True, soft_shadows=soft)
    target = jnp.zeros((H, W, 3), jnp.float32)

    def loss_block(params):
        sc = inverse.apply_params(scene, params)
        out = fk.frame_forward_jnp(sc, cam, FRAME, cfg)
        return jnp.mean((_image_from_planes(out, cfg) - target) ** 2)

    def loss_pass(params):
        sc = inverse.apply_params(scene, params)
        return jnp.mean((_pass_image(sc, cam, cfg) - target) ** 2)

    params = inverse.extract_params(scene)
    g_block = jax.jit(jax.grad(loss_block))(params)
    g_pass = jax.jit(jax.grad(loss_pass))(params)
    for k in params:
        a, b = np.asarray(g_pass[k]), np.asarray(g_block[k])
        assert np.isfinite(b).all(), k
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=2e-3 * scale, err_msg=k)


@pytest.mark.slow
def test_backward_kernel_matches_jnp_interpret():
    """The backward Pallas kernel (interpret mode) reproduces plain-jnp
    gradients of the same block function — validates operand order, the
    cotangent plumbing and the cross-block accumulation."""
    scene = default_scene()
    cam = Camera.create(loc=LOC, orient=ORI)
    w, h = 48, 16
    cfg = RenderConfig(width=w, height=h, no_history=True)

    def loss_jnp(scene, cam):
        out = fk.frame_forward_jnp(scene, cam, FRAME, cfg)
        return jnp.mean(out["add_d"]) + jnp.mean(out["add_s"]) + jnp.mean(
            out["alb"]
        ) + jnp.mean(out["ene"]) + jnp.mean(out["depth"]) * 0.01

    def loss_pal(scene, cam):
        out = fg.frame_forward(scene, cam, FRAME, cfg, interpret=True)
        return jnp.mean(out["add_d"]) + jnp.mean(out["add_s"]) + jnp.mean(
            out["alb"]
        ) + jnp.mean(out["ene"]) + jnp.mean(out["depth"]) * 0.01

    g_ref = jax.grad(loss_jnp, argnums=(0, 1), allow_int=True)(scene, cam)
    g_pal = jax.grad(loss_pal, argnums=(0, 1), allow_int=True)(scene, cam)

    for name in ("planes", "spheres", "boxes", "light_color"):
        a = np.asarray(getattr(g_ref[0], name))
        b = np.asarray(getattr(g_pal[0], name))
        np.testing.assert_allclose(
            b, a, atol=1e-5 * (np.abs(a).max() + 1e-6), err_msg=name
        )
    # Magnitude-scaled atol, not rtol: cross-block accumulation reorders the
    # sum, so small components carry absolute noise. Round 3 measured the
    # camera-loc accumulation noise at 2.7e-6 abs / 5.5e-5 rel (atol 2e-5·max
    # missed it by 1.5x); 1e-4·max gives 3x margin over the measured noise
    # while still catching a genuinely wrong gradient (typically off by >1%).
    a = np.asarray(g_ref[1].loc)
    np.testing.assert_allclose(
        np.asarray(g_pal[1].loc), a, atol=1e-4 * (np.abs(a).max() + 1e-6)
    )
