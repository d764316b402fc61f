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
