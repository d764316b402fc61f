"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kylespathtracer_tpu.ops import shade_kernel as sk
from kylespathtracer_tpu.render import camera as cam_mod
from kylespathtracer_tpu.render import gbuffer as gb_mod
from kylespathtracer_tpu.render import mis as mis_mod
from kylespathtracer_tpu.render.passes import _shade_common, get_trace
from kylespathtracer_tpu.render.pipeline import init_history, render_frame
from kylespathtracer_tpu.scene import default_scene
from kylespathtracer_tpu.utils.config import RenderConfig

SCENE = default_scene()
CAM = cam_mod.Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))


@pytest.mark.slow
def test_shade_kernel_matches_dual_mis():
    """The fused Pallas shade must reproduce mis.dual_mis to float noise."""
    cfg = RenderConfig(width=64, height=32)
    frame = jnp.asarray(0, jnp.int32)
    gb = gb_mod.geometry_pass(SCENE, CAM, cfg)
    hl, seed = _shade_common(SCENE, cfg, gb, CAM, frame)
    trace = get_trace(cfg)
    est_d, est_s = mis_mod.dual_mis(
        SCENE, trace, gb.ray_dir, hl, gb.normal, gb.obj_id, seed, cfg
    )
    shade = ((gb.obj_id != SCENE.light_id) & (gb.obj_id > 0))[..., None]
    est_d = jnp.where(shade, est_d, 0.0)
    est_s = jnp.where(shade, est_s, 0.0)

    kd, ks = sk.dual_mis_pallas(
        SCENE, gb, CAM, seed, cfg, block_rows=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(kd), np.asarray(est_d), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ks), np.asarray(est_s), atol=2e-5)


@pytest.mark.slow
def test_pallas_backend_pipeline():
    """Full frame with shade_backend='pallas' matches the XLA pipeline."""
    cfg_x = RenderConfig(width=48, height=32)
    cfg_p = RenderConfig(width=48, height=32, shade_backend="pallas")
    hist = init_history(cfg_x, CAM)
    frame = jnp.asarray(1, jnp.int32)
    img_x, _ = render_frame(SCENE, CAM, hist, frame, cfg_x)
    img_p, _ = render_frame(SCENE, CAM, hist, frame, cfg_p)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x), atol=1e-4)
