"""Fused multi-bounce path kernel (ops/path_kernel.py) vs the XLA
wavefront integrator (render/wavefront.py).

The fast test runs the kernel's math as plain jnp (`pathtrace_jnp`, no
Pallas interpret overhead) — the two integrators share nothing except the
scene/sampler modules, so agreement covers raygen, the inside-hit trace,
NEE + MIS weights, all four BSDF lobes and the R2/PCG streams. The slow
test runs the real pallas_call in interpret mode (block accumulation,
operand order, grid).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kylespathtracer_tpu.ops import path_kernel as pk
from kylespathtracer_tpu.render import wavefront as wf
from kylespathtracer_tpu.render.camera import Camera
from kylespathtracer_tpu.scene import default_scene
from kylespathtracer_tpu.scene.scene import sphere_scene
from kylespathtracer_tpu.utils.config import RenderConfig
import dataclasses

CAM = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
FRAME = jnp.asarray(0, jnp.int32)


def _xla(cfg):
    return dataclasses.replace(cfg, path_backend="xla")


def test_path_block_matches_xla_wavefront():
    scene = default_scene()
    cfg = RenderConfig(width=64, height=48, spp=2, max_depth=3)
    ref = np.asarray(wf.pathtrace(scene, CAM, _xla(cfg), FRAME))
    img = np.asarray(pk.pathtrace_jnp(scene, CAM, cfg, FRAME))
    d = np.abs(ref - img)
    assert np.isfinite(img).all()
    assert np.median(d) < 1e-6
    assert (d > 1e-3).mean() < 0.002, f"{(d > 1e-3).mean():.3%} differ"


def test_path_block_matches_xla_spheres_dielectric():
    """Sphere-only scene with glossy/mirror/dielectric lobes: exercises the
    inside-hit far-root trace and the Fresnel branch."""
    import numpy as onp

    scene = sphere_scene(
        centers=[[0.0, 1.0, 6.0], [2.0, 1.2, 7.0], [-2.0, 1.0, 6.5]],
        radii=[1.0, 0.8, 0.9],
        albedos=[[0.7, 0.3, 0.2], [0.9, 0.9, 0.9], [0.95, 0.95, 0.95]],
        kinds=[0, 2, 3],  # diffuse, mirror, dielectric
    )
    cam = Camera.create(loc=(0.0, 2.0, 0.0), orient=(0.0, 0.0))
    cfg = RenderConfig(width=48, height=32, spp=2, max_depth=4)
    ref = onp.asarray(wf.pathtrace(scene, cam, _xla(cfg), FRAME))
    img = onp.asarray(pk.pathtrace_jnp(scene, cam, cfg, FRAME))
    d = onp.abs(ref - img)
    assert onp.isfinite(img).all()
    assert onp.median(d) < 1e-6
    assert (d > 1e-3).mean() < 0.002, f"{(d > 1e-3).mean():.3%} differ"


@pytest.mark.slow
def test_path_kernel_interpret_matches_xla():
    scene = default_scene()
    cfg = RenderConfig(width=48, height=16, spp=1, max_depth=2)
    ref = np.asarray(wf.pathtrace(scene, CAM, _xla(cfg), FRAME))
    img = np.asarray(
        pk.pathtrace_pallas(scene, CAM, cfg, FRAME, interpret=True)
    )
    d = np.abs(ref - img)
    assert np.median(d) < 1e-6
    assert (d > 1e-3).mean() < 0.005
