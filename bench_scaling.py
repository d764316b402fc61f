"""Scaling harness: strong-scaling efficiency of the shard_map renderer.

Run with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=8 (the
virtual-ICI fake backend; bench.py does this via subprocess) or on a real
multi-chip slice. Renders the same frame on 1 device and on all N devices
and prints JSON lines:

    {"metric": "scaling_efficiency_pct", "value": ..., "n_devices": N, ...}

Efficiency = T_1 / (N * T_N) for the same total image (strong scaling) —
the BASELINE.json north-star asks >= 85% at 2 hosts.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from kylespathtracer_tpu import Camera, RenderConfig, default_scene, init_history
from kylespathtracer_tpu.parallel import mesh as mesh_mod
from kylespathtracer_tpu.parallel.shard import render_frame_tiled

W, H, FRAMES = 256, 128, 4


def time_tiled(n_dev: int) -> float:
    config = RenderConfig(width=W, height=H)
    mesh = mesh_mod.make_mesh(n_dev)
    scene = default_scene()
    camera = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
    history = init_history(config, camera)

    img, history = render_frame_tiled(
        scene, camera, history, jnp.asarray(0, jnp.int32), config, mesh
    )
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for i in range(1, FRAMES + 1):
        img, history = render_frame_tiled(
            scene, camera, history, jnp.asarray(i, jnp.int32), config, mesh
        )
    jax.block_until_ready(img)
    return (time.perf_counter() - t0) / FRAMES


def main():
    n = len(jax.devices())
    t1 = time_tiled(1)
    if n == 1:
        print(json.dumps({
            "metric": "scaling_efficiency_pct", "value": None, "n_devices": 1,
            "note": "single device; no scaling measurement",
        }))
        return
    tn = time_tiled(n)
    eff = t1 / (n * tn) * 100.0
    print(json.dumps({
        "metric": "scaling_efficiency_pct",
        "value": round(eff, 1),
        "n_devices": n,
        "frame_ms_1dev": round(t1 * 1e3, 1),
        "frame_ms_ndev": round(tn * 1e3, 1),
        "resolution": f"{W}x{H}",
    }))


if __name__ == "__main__":
    main()
