"""Benchmark: forward primary-ray throughput on the live device.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's implied ~55 Mrays/s primary throughput at
1280x720@60fps on a desktop GPU (BASELINE.md; main.cpp:302,355).
Supplementary metrics (fwd+bwd step, per-frame wall) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")

import jax
import jax.numpy as jnp

from kylespathtracer_tpu import (
    Camera,
    RenderConfig,
    default_scene,
    init_history,
    render_frame,
)
from kylespathtracer_tpu.utils.jitting import donate_history_kwargs

BASELINE_RAYS_PER_S = 55.3e6  # 1280*720*60


def main():
    config = RenderConfig(width=1920, height=1080)
    scene = default_scene()
    camera = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
    history = init_history(config, camera)
    frame0 = jnp.asarray(0, jnp.int32)

    fn = jax.jit(
        render_frame, static_argnames=("config",), **donate_history_kwargs()
    )

    # Warmup / compile.
    t0 = time.perf_counter()
    image, history = fn(scene, camera, history, frame0, config)
    jax.block_until_ready(image)
    print(f"compile+first frame: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    iters = 20
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        image, history = fn(scene, camera, history, jnp.asarray(i, jnp.int32), config)
    jax.block_until_ready(image)
    dt = (time.perf_counter() - t0) / iters

    rays = config.width * config.height  # primary rays per frame at 1 spp
    rays_per_s = rays / dt
    print(f"frame: {dt*1e3:.1f} ms at {config.width}x{config.height}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "primary_rays_per_s_fwd_1080p",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
