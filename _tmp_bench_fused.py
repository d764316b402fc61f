import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")
import jax, jax.numpy as jnp
from kylespathtracer_tpu import Camera, RenderConfig, default_scene, init_history, render_frame
from kylespathtracer_tpu.utils.jitting import donate_history_kwargs

config = RenderConfig(width=1920, height=1080, pipeline="fused")
scene = default_scene()
camera = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
history = init_history(config, camera)
fn = jax.jit(render_frame, static_argnames=("config",), **donate_history_kwargs())
t0 = time.perf_counter()
img, history = fn(scene, camera, history, jnp.asarray(0, jnp.int32), config)
jax.block_until_ready(img)
print(f"fused compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
print("finite:", bool(jnp.isfinite(img).all()), "mean:", float(img.mean()))
iters = 50
t0 = time.perf_counter()
for i in range(1, iters+1):
    img, history = fn(scene, camera, history, jnp.asarray(i, jnp.int32), config)
jax.block_until_ready(img)
dt = (time.perf_counter()-t0)/iters
print(f"fused frame: {dt*1e3:.2f} ms -> {config.width*config.height/dt/1e6:.1f} Mrays/s")
