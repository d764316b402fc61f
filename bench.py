"""Benchmark: forward primary-ray throughput on the live device.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's implied ~55 Mrays/s primary throughput at
1280x720@60fps on a desktop GPU (BASELINE.md; main.cpp:302,355).

Supplementary metrics on stderr (also JSON lines, recorded in the driver's
artifact tail):
  * fwd:     fused-pipeline frame time / rays/s at 1080p (the headline)
  * fwd+bwd: value_and_grad of a pixel loss through the differentiable
             pipeline at 1spp 1080p (the BASELINE.json metric)
  * scaling: 1 vs 8 virtual CPU devices at small res via a subprocess
             (efficiency %; real multi-chip when hardware allows)
"""

from __future__ import annotations

import json
import os
import subprocess
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


def stderr_json(**kw):
    print(json.dumps(kw), file=sys.stderr, flush=True)


def bench_forward(scene, camera, width=1920, height=1080, iters=30):
    """Fused-pipeline forward frames; falls back to the XLA pipeline if the
    Pallas kernel fails on this backend."""
    for pipeline in ("fused", "pass"):
        config = RenderConfig(width=width, height=height, pipeline=pipeline)
        try:
            history = init_history(config, camera)
            fn = jax.jit(
                render_frame, static_argnames=("config",), **donate_history_kwargs()
            )
            t0 = time.perf_counter()
            image, history = fn(scene, camera, history, jnp.asarray(0, jnp.int32), config)
            jax.block_until_ready(image)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(1, iters + 1):
                image, history = fn(
                    scene, camera, history, jnp.asarray(i, jnp.int32), config
                )
            jax.block_until_ready(image)
            dt = (time.perf_counter() - t0) / iters
            stderr_json(
                metric="fwd_frame_ms_1080p", pipeline=pipeline,
                value=round(dt * 1e3, 2), compile_s=round(compile_s, 1),
            )
            return width * height / dt
        except Exception as e:  # pragma: no cover - fallback path
            stderr_json(metric="fwd_pipeline_error", pipeline=pipeline, error=str(e)[:200])
    raise RuntimeError("both pipelines failed")


def bench_fwd_bwd(scene, camera, width=1920, height=1080, iters=5):
    """value_and_grad of a pixel loss through the differentiable pipeline
    (BASELINE.json: rays/s/chip fwd+bwd at 1spp 1080p)."""
    config = RenderConfig(width=width, height=height)
    history = init_history(config, camera)

    def loss_fn(scene, camera, history, frame):
        img, _ = render_frame(scene, camera, history, frame, config)
        return jnp.mean(img)

    vg = jax.jit(jax.value_and_grad(loss_fn, allow_int=True))
    t0 = time.perf_counter()
    v, _ = vg(scene, camera, history, jnp.asarray(0, jnp.int32))
    jax.block_until_ready(v)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        v, g = vg(scene, camera, history, jnp.asarray(i, jnp.int32))
    jax.block_until_ready(v)
    dt = (time.perf_counter() - t0) / iters
    stderr_json(
        metric="fwd_bwd_rays_per_s_1080p",
        value=round(width * height / dt, 1),
        frame_ms=round(dt * 1e3, 2),
        compile_s=round(compile_s, 1),
    )


def bench_scaling():
    """1-vs-8 virtual CPU devices in a subprocess (ICI-analog efficiency)."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_scaling.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    try:
        out = subprocess.run(
            [sys.executable, script], env=env, capture_output=True, text=True,
            timeout=420,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line, file=sys.stderr, flush=True)
        if out.returncode != 0:
            stderr_json(metric="scaling_error", tail=out.stderr[-200:])
    except Exception as e:  # pragma: no cover
        stderr_json(metric="scaling_error", error=str(e)[:200])


def main():
    scene = default_scene()
    camera = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))

    rays_per_s = bench_forward(scene, camera)
    bench_fwd_bwd(scene, camera)
    bench_scaling()

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
