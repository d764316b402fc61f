import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")
import jax, jax.numpy as jnp
from kylespathtracer_tpu.diff import inverse
from kylespathtracer_tpu.scene.scene import sphere_scene
from kylespathtracer_tpu.render.camera import Camera
from kylespathtracer_tpu.utils.config import RenderConfig

cfg = RenderConfig(width=96, height=64)
cam = Camera.create(loc=(0.0, 2.5, -2.0), orient=(0.15, 0.0))
scene = sphere_scene([[0.,1.,6.],[2.,1.,7.]], [1.,0.8], [[.6,.3,.2],[.2,.5,.6]])
t0=time.time()
target = inverse.render_once(scene, cam, cfg, jnp.asarray(0, jnp.int32))
jax.block_until_ready(target); print(f"target render (compile): {time.time()-t0:.1f}s", flush=True)
t0=time.time()
fitted, losses = inverse.fit(scene, target, cam, cfg, steps=10, lr=1e-2)
print(f"10 steps: {time.time()-t0:.1f}s; losses {losses[0]:.2e} -> {losses[-1]:.2e}")
