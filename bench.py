"""Benchmark: forward primary-ray throughput on the live device.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's implied ~55 Mrays/s primary throughput at
1280x720@60fps on a desktop GPU (BASELINE.md; main.cpp:302,355).

Measurement honesty (round-3 rework): `jax.block_until_ready` was observed
to return early over this image's axon remote-TPU tunnel, recording ~1000x
optimistic numbers in BENCH_r02. Every timing below therefore synchronizes
with `_sync`: a device_get of a scalar reduction over ALL outputs (image AND
history / value AND every gradient leaf) — a data fetch cannot complete
before the compute that produces it. Each pipelined number is cross-checked
against an independent per-frame-blocked timing and replaced by it if the
two disagree by more than the plausible overlap factor.

Supplementary metrics on stderr (also JSON lines, recorded in the driver's
artifact tail):
  * fwd:     fused-pipeline frame time / rays/s at 1080p (the headline)
  * fwd+bwd: value_and_grad of a pixel loss through the differentiable
             pipeline at 1spp 1080p (the BASELINE.json metric)
  * wavefront: multi-bounce integrator path-segments/s
  * scaling: virtual-mesh correctness + HLO-cost-model efficiency via a
             subprocess (wall-clock on shared-core virtual devices is
             meaningless; see bench_scaling.py)
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


def _sync(tree) -> float:
    """Hard synchronization: fetch a scalar reduction of every array leaf.

    The reduction is queued after all producing computation on the device
    stream, and device_get cannot return before the bytes exist — unlike
    block_until_ready, which has returned early on the axon tunnel."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if isinstance(l, jax.Array)]
    acc = jnp.zeros((), jnp.float32)
    for l in leaves:
        acc = acc + jnp.sum(jnp.abs(l).astype(jnp.float32))
    return float(jax.device_get(acc))


def _roundtrip_s() -> float:
    """One host<->device scalar fetch (tunnel latency floor for blocked
    timings)."""
    x = jnp.zeros((), jnp.float32)
    _ = float(jax.device_get(x + 1.0))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(jax.device_get(x + 1.0))
    return (time.perf_counter() - t0) / 5


def _timed(step, sync_out, iters: int, rtt: float, tag: str):
    """Time `step(i) -> outputs` two ways and reconcile.

    * blocked:   every frame fully synced (minus the measured host roundtrip)
    * pipelined: frames queued back-to-back, one final sync; outputs chain
                 through the loop state so the final sync awaits every frame
    Returns the honest per-iteration seconds: the pipelined figure, unless it
    is implausibly faster than the blocked one (overlap can hide host
    dispatch, not device compute), in which case the blocked figure wins.
    """
    # Blocked.
    t0 = time.perf_counter()
    for i in range(iters):
        _sync(sync_out(step(i)))
    dt_blocked_raw = (time.perf_counter() - t0) / iters
    dt_blocked = max(dt_blocked_raw - rtt, 1e-9)

    # Pipelined.
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = step(iters + i)
    _sync(sync_out(out))
    dt_pipe = (time.perf_counter() - t0) / iters

    artifact = dt_pipe < dt_blocked / 3.0
    dt = dt_blocked if artifact else dt_pipe
    stderr_json(
        metric=f"{tag}_timing_detail",
        blocked_ms=round(dt_blocked_raw * 1e3, 2),
        blocked_minus_rtt_ms=round(dt_blocked * 1e3, 2),
        pipelined_ms=round(dt_pipe * 1e3, 2),
        rtt_ms=round(rtt * 1e3, 2),
        reported_ms=round(dt * 1e3, 2),
        pipelined_rejected=bool(artifact),
        iters=iters,
    )
    return dt


def bench_forward(scene, camera, rtt, width=1920, height=1080, iters=30):
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
            _sync((image, history))
            compile_s = time.perf_counter() - t0

            state = {"h": history}

            def step(i):
                img, state["h"] = fn(
                    scene, camera, state["h"], jnp.asarray(i, jnp.int32), config
                )
                return img, state["h"]

            dt = _timed(step, lambda o: o, iters, rtt, f"fwd_{pipeline}")
            stderr_json(
                metric="fwd_frame_ms_1080p", pipeline=pipeline,
                value=round(dt * 1e3, 2), compile_s=round(compile_s, 1),
            )
            # Each pixel traces ~9 rays per frame (primary + direct-light
            # visibility + 4 roulette plane marches + 4 light re-samples,
            # SURVEY §3.2): the headline counts primaries only; this is the
            # total traced-ray throughput.
            stderr_json(
                metric="traced_rays_per_s_1080p", pipeline=pipeline,
                value=round(9 * width * height / dt, 1),
            )
            return width * height / dt
        except Exception as e:  # pragma: no cover - fallback path
            stderr_json(metric="fwd_pipeline_error", pipeline=pipeline, error=str(e)[:200])
    raise RuntimeError("both pipelines failed")


def bench_fwd_bwd(scene, camera, rtt, width=1920, height=1080, iters=10):
    """value_and_grad of a pixel loss through the differentiable pipeline
    (BASELINE.json: rays/s/chip fwd+bwd at 1spp 1080p).

    Uses the fused Pallas frame with its custom-VJP backward kernel
    (ops/frame_grad.py) + the single-frame no_history fast path; falls back
    to the XLA pass pipeline if the kernels fail on this backend."""
    for pipeline in ("fused", "pass"):
        try:
            return _bench_fwd_bwd_one(
                scene, camera, rtt, width, height, iters, pipeline
            )
        except Exception as e:  # pragma: no cover - fallback path
            stderr_json(
                metric="fwd_bwd_pipeline_error", pipeline=pipeline,
                error=str(e)[:200],
            )
    raise RuntimeError("both fwd+bwd pipelines failed")


def _bench_fwd_bwd_one(scene, camera, rtt, width, height, iters, pipeline):
    config = RenderConfig(
        width=width, height=height, no_history=True, pipeline=pipeline
    )
    history = init_history(config, camera)

    def loss_fn(scene, camera, history, frame):
        img, _ = render_frame(scene, camera, history, frame, config)
        return jnp.mean(img)

    vg = jax.jit(jax.value_and_grad(loss_fn, allow_int=True))
    t0 = time.perf_counter()
    v, g = vg(scene, camera, history, jnp.asarray(0, jnp.int32))
    _sync((v, g))
    compile_s = time.perf_counter() - t0

    def step(i):
        return vg(scene, camera, history, jnp.asarray(i, jnp.int32))

    dt = _timed(step, lambda o: o, iters, rtt, "fwd_bwd")
    stderr_json(
        metric="fwd_bwd_rays_per_s_1080p",
        value=round(width * height / dt, 1),
        frame_ms=round(dt * 1e3, 2),
        pipeline=pipeline,
        compile_s=round(compile_s, 1),
    )


def bench_raycast(scene, camera, rtt, width=1920, height=1080, iters=30):
    """Primary-visibility raycast (the geometry pass alone: raygen +
    nearest-hit + analytic normals/curvature + G-buffer write) — the raw
    per-chip ray throughput the ≥1 Grays/s north star names."""
    from kylespathtracer_tpu.ops import frame_kernel as fk

    config = RenderConfig(width=width, height=height)
    fn = jax.jit(
        lambda s, c, f: fk.geometry_pass_pallas(s, c, f, config)
    )
    try:
        t0 = time.perf_counter()
        out = fn(scene, camera, jnp.asarray(0, jnp.int32))
        _sync(out)
        compile_s = time.perf_counter() - t0

        def step(i):
            return fn(scene, camera, jnp.asarray(i, jnp.int32))

        dt = _timed(step, lambda o: o, iters, rtt, "raycast")
        stderr_json(
            metric="raycast_rays_per_s_1080p",
            value=round(width * height / dt, 1),
            frame_ms=round(dt * 1e3, 2), compile_s=round(compile_s, 1),
        )
    except Exception as e:  # pragma: no cover
        stderr_json(metric="raycast_error", error=str(e)[:200])


def bench_wavefront(scene, camera, rtt, width=1920, height=1080, iters=5,
                    spp=4, depth=6):
    """Multi-bounce wavefront integrator: path-segments/s at 1080p."""
    from kylespathtracer_tpu.render import wavefront as wf

    config = RenderConfig(width=width, height=height, spp=spp, max_depth=depth)
    fn = jax.jit(wf.render_pathtraced, static_argnames=("config",))
    try:
        t0 = time.perf_counter()
        img = fn(scene, camera, config, jnp.asarray(0, jnp.int32))
        _sync(img)
        compile_s = time.perf_counter() - t0

        def step(i):
            return fn(scene, camera, config, jnp.asarray(i, jnp.int32))

        dt = _timed(step, lambda o: o, iters, rtt, "wavefront")
        segs = width * height * spp * depth
        stderr_json(
            metric="wavefront_segments_per_s_1080p",
            value=round(segs / dt, 1),
            frame_ms=round(dt * 1e3, 2),
            spp=spp, depth=depth, compile_s=round(compile_s, 1),
        )
    except Exception as e:  # pragma: no cover
        stderr_json(metric="wavefront_error", error=str(e)[:200])


def bench_scaling():
    """Virtual-mesh correctness + HLO-cost-model efficiency in a subprocess
    (bench_scaling.py forces the CPU platform itself; the env vars here are
    belt-and-braces, sitecustomize overrides them)."""
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
    rtt = _roundtrip_s()
    stderr_json(metric="host_device_roundtrip_ms", value=round(rtt * 1e3, 2))

    rays_per_s = bench_forward(scene, camera, rtt)
    bench_fwd_bwd(scene, camera, rtt)
    bench_raycast(scene, camera, rtt)
    bench_wavefront(scene, camera, rtt)
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
