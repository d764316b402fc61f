"""Fused full-frame kernel (ops/frame_kernel.py) vs the unfused pipeline,
and analytic normals (scene/normals.py) vs the tetrahedron estimator.

The Pallas kernel runs in interpret mode on CPU; differences vs the XLA
path are pure float-association ulps, which only matter where they flip a
decision boundary (roulette CDF pick, checker floor, ID match)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kylespathtracer_tpu.ops import frame_kernel as fk
from kylespathtracer_tpu.render import gbuffer as gbm
from kylespathtracer_tpu.render.camera import Camera
from kylespathtracer_tpu.render.pipeline import init_history, render_frame
from kylespathtracer_tpu.scene import default_scene
from kylespathtracer_tpu.scene import normals as nrm_mod
from kylespathtracer_tpu.scene import sdf as sdf_mod
from kylespathtracer_tpu.utils.config import RenderConfig

W, H = 48, 32
LOC = (3.0, 2.0, -3.0)
ORI = (0.0, 0.7)


@pytest.mark.slow
def test_fused_geometry_matches_pass():
    scene = default_scene()
    cam = Camera.create(loc=LOC, orient=ORI)
    cfg = RenderConfig(width=W, height=H)
    gb = gbm.geometry_pass(scene, cam, cfg)
    out = fk.frame_forward_pallas(scene, cam, jnp.asarray(0, jnp.int32), cfg,
                                  interpret=True)
    assert (np.asarray(gb.obj_id) == np.asarray(out["oid"])).all()
    np.testing.assert_allclose(
        np.asarray(gb.depth), np.asarray(out["depth"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gb.curv), np.asarray(out["curv"]), atol=1e-5
    )


@pytest.mark.slow
def test_fused_frame_matches_pass_image():
    scene = default_scene()
    cam = Camera.create(loc=LOC, orient=ORI)
    imgs = {}
    for name, cfg in {
        "pass": RenderConfig(width=W, height=H),
        "fused": RenderConfig(width=W, height=H, pipeline="fused"),
    }.items():
        hist = init_history(cfg, cam)
        img, hist = render_frame(scene, cam, hist, jnp.asarray(0, jnp.int32), cfg)
        imgs[name] = np.asarray(img)
    d = np.abs(imgs["pass"] - imgs["fused"])
    assert np.isfinite(imgs["fused"]).all()
    # Boundary flips only: tiny median, few affected components.
    assert np.median(d) < 1e-5
    assert (d > 3e-2).mean() < 0.03, f"{(d > 3e-2).mean():.3%} differ"


@pytest.mark.slow
@pytest.mark.parametrize(
    "quality",
    [
        dict(biased=False),
        dict(
            smp_direct_lambert=2, smp_lambert_surface_lambert=2,
            smp_lambert_surface_phong=2, smp_direct_phong=2,
            smp_phong_surface_lambert=2, smp_phong_surface_phong=2,
        ),
    ],
    ids=["unbiased", "smp2"],
)
def test_fused_temporal_quality_configs_match_pass(quality):
    """Quality-config parity for the fully fused TEMPORAL kernel
    (ops/frame_hist.py), not just the single-frame kernel: the unbiased
    ground-truth estimators (biased=False, common.glsl:394-415) and smp_*=2
    must agree with the pass pipeline over a 3-frame moving sequence where
    the second and third frames reproject real accumulated history.
    (Round-4 verdict item 5; the no-history variants live in
    tests/test_frame_grad.py.)"""
    scene = default_scene()
    cam0 = Camera.create(loc=LOC, orient=ORI)
    cams = [
        cam0.replace(
            orient=cam0.orient
            + jnp.asarray([-0.01, 0.002], jnp.float32) * i,
            loc=cam0.loc + jnp.asarray([0.001, 0.0, 0.001], jnp.float32) * i,
        )
        for i in range(3)
    ]
    imgs, cnts = {}, {}
    for name, cfg in {
        "pass": RenderConfig(width=128, height=32, **quality),
        "fused": RenderConfig(width=128, height=32, pipeline="fused",
                              **quality),
    }.items():
        hist = init_history(cfg, cams[0])
        img = None
        for i, cam in enumerate(cams):
            img, hist = render_frame(
                scene, cam, hist, jnp.asarray(i, jnp.int32), cfg
            )
        imgs[name] = np.asarray(img)
        cnts[name] = float(np.mean(np.asarray(hist.diffuse.cnt)))
    assert np.isfinite(imgs["fused"]).all()
    # History must actually accumulate under the slow pan, on both paths.
    assert cnts["fused"] > 1.5 and cnts["pass"] > 1.5, cnts
    d = np.abs(imgs["pass"] - imgs["fused"])
    # Boundary flips only: tiny median, few affected components.
    assert np.median(d) < 1e-5
    assert (d > 3e-2).mean() < 0.03, f"{(d > 3e-2).mean():.3%} differ"


def test_analytic_normals_match_tetra():
    scene = default_scene()
    cam = Camera.create(loc=LOC, orient=ORI)
    cfg = RenderConfig(width=W, height=H)
    gb = gbm.geometry_pass(scene, cam, cfg)  # analytic normals by default
    from kylespathtracer_tpu.render.camera import ray_dirs

    rd = ray_dirs(cam, W, H)
    hl = cam.loc + rd * (gb.depth[..., None] + 1e-3)
    n_t, c_t = sdf_mod.norcurv(scene, hl)
    n_a, c_a = nrm_mod.normal_curv(scene, hl, gb.obj_id)
    hit = np.asarray(gb.obj_id) > 0
    # Agreement away from primitive junctions (where the tetrahedron taps
    # blend two primitives): 98th percentile of the angular error is tight.
    dots = np.sum(np.asarray(n_t) * np.asarray(n_a), axis=-1)[hit]
    assert np.quantile(dots, 0.02) > 0.999
    cd = np.abs(np.asarray(c_t) - np.asarray(c_a))[hit]
    assert np.quantile(cd, 0.98) < 1e-3
