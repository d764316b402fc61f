"""Benchmark: forward primary-ray throughput on the live device.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's implied ~55 Mrays/s primary throughput at
1280x720@60fps on a desktop GPU (BASELINE.md; main.cpp:302,355).

Measurement honesty (round-4 rework): the host<->device tunnel on this
image has a ~27 ms round trip, which swamps single-dispatch timings of
single-digit-ms kernels (round 3's blocked/pipelined reconciliation hit
that floor: it rejected a plausible 4.3 ms raycast because the rtt-polluted
blocked figure read 13.9 ms). Every headline number below is therefore
**device-resident**: K frames chained inside ONE jitted `lax.scan` (the
loop carry serializes the frames; outputs fold into a scalar so nothing is
fetched mid-loop), timed at two K values, and the per-frame time taken as
the SLOPE (T(K_hi) - T(K_lo)) / (K_hi - K_lo) — rtt, dispatch, and sync
overhead cancel exactly in the difference. A third K point checks
linearity; `linear_ok` in the detail line means the two sub-slopes agree
within 20%. The single-dispatch blocked figure is still recorded in the
detail line as a sanity bound (scan slope must not exceed it).

Synchronization uses `_sync`: a device_get of a scalar reduction — a data
fetch cannot complete before the compute that produces it (
`jax.block_until_ready` has returned early on the axon tunnel, BENCH_r02).

Supplementary metrics on stderr (also JSON lines, recorded in the driver's
artifact tail):
  * fwd:     fused-pipeline frame time / rays/s at 1080p (the headline)
  * fwd+bwd: value_and_grad of a pixel loss through the differentiable
             pipeline at 1spp 1080p (the BASELINE.json metric)
  * raycast: the geometry pass alone (primary visibility + normals)
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
BASELINE_RAYS_PER_S = 55.3e6  # 1280*720*60


_FULL_LOG = None  # opened in main(); bench_* helpers still work standalone


def stderr_json(**kw):
    """One metric line → stderr (driver tail) AND the full JSONL artifact.

    The driver's BENCH_r{N}.json records only the stderr TAIL, which
    truncated the round-4 headline lines off the top; BENCH_full_r{N}.jsonl
    is the self-contained primary record (round-4 verdict item 8)."""
    line = json.dumps(kw)
    print(line, file=sys.stderr, flush=True)
    if _FULL_LOG is not None:
        _FULL_LOG.write(line + "\n")
        _FULL_LOG.flush()


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


def _timed_scan(make_scan, ks, tag: str, reps: int = 3,
                blocked_ms: float | None = None):
    """Device-resident per-frame time via the multi-K slope method.

    `make_scan(K)` returns a zero-argument callable that runs K chained
    frames on-device and returns a scalar (synced with `_sync`). The
    per-frame time is the least-squares slope of total time vs K; rtt and
    per-dispatch overhead are the intercept and cancel out of the slope.
    `ks` must be ≥3 ascending ints; the detail line records the sub-slopes
    between consecutive K pairs and whether they agree within 20%.
    """
    fns = [make_scan(k) for k in ks]
    compile_s = 0.0
    times = []
    for fn in fns:
        t0 = time.perf_counter()
        _sync(fn())  # compile + warm
        compile_s += time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(fn())
            best = min(best, time.perf_counter() - t0)
        times.append(best)

    # Least-squares slope of best-time vs K.
    n = len(ks)
    mk = sum(ks) / n
    mt = sum(times) / n
    slope = sum((k - mk) * (t - mt) for k, t in zip(ks, times)) / sum(
        (k - mk) ** 2 for k in ks
    )
    sub = [
        (times[i + 1] - times[i]) / (ks[i + 1] - ks[i]) for i in range(n - 1)
    ]
    lo, hi = min(sub), max(sub)
    linear_ok = hi <= lo * 1.2 + 1e-4
    detail = dict(
        metric=f"{tag}_timing_detail",
        method="scan-slope",
        ks=list(ks),
        totals_ms=[round(t * 1e3, 2) for t in times],
        sub_slopes_ms=[round(s * 1e3, 3) for s in sub],
        slope_ms=round(slope * 1e3, 3),
        linear_ok=bool(linear_ok),
        compile_s=round(compile_s, 1),
        reps=reps,
    )
    if blocked_ms is not None:
        detail["blocked_single_dispatch_ms"] = round(blocked_ms, 2)
        detail["scan_within_blocked"] = bool(slope * 1e3 <= blocked_ms * 1.2)
    stderr_json(**detail)
    return max(slope, 1e-9)


def _blocked_once(step, iters: int, rtt: float) -> float:
    """Single-dispatch blocked timing (sanity upper bound), rtt-corrected."""
    t0 = time.perf_counter()
    for i in range(iters):
        _sync(step(i))
    return max((time.perf_counter() - t0) / iters - rtt, 1e-9) * 1e3


def bench_forward(scene, camera, rtt, width=1920, height=1080, iters=8):
    """Fused-pipeline forward frames (history carried through the scan, so
    every frame pays the real reprojection + temporal accumulation cost);
    falls back to the XLA pipeline if the Pallas kernel fails."""
    for pipeline in ("fused", "pass"):
        config = RenderConfig(width=width, height=height, pipeline=pipeline)
        try:
            history = init_history(config, camera)

            def make_scan(K):
                def body(carry, i):
                    hist, acc = carry
                    # Slow pan (~0.3 px/frame at 1080p): keeps the temporal
                    # reprojection honestly exercised — a static camera
                    # would let the history kernel's dead-offset skips
                    # (ops/frame_hist.py) collapse to the single (0,0) term.
                    cam = camera.replace(
                        orient=camera.orient
                        + jnp.asarray([0.0, 1e-3], jnp.float32)
                        * i.astype(jnp.float32)
                    )
                    img, hist = render_frame(scene, cam, hist, i, config)
                    return (hist, acc + img[0, 0, 0]), None

                @jax.jit
                def run(history):
                    (h, acc), _ = jax.lax.scan(
                        body, (history, jnp.float32(0.0)),
                        jnp.arange(K, dtype=jnp.int32),
                    )
                    return acc

                return lambda: run(history)

            # Blocked single-dispatch sanity bound.
            fn = jax.jit(render_frame, static_argnames=("config",))
            img, hist2 = fn(scene, camera, history, jnp.asarray(0, jnp.int32), config)
            _sync((img, hist2))
            blocked = _blocked_once(
                lambda i: fn(scene, camera, history, jnp.asarray(i, jnp.int32), config),
                iters, rtt,
            )

            dt = _timed_scan(
                make_scan, (4, 20, 36), f"fwd_{pipeline}", blocked_ms=blocked
            )
            stderr_json(
                metric="fwd_frame_ms_1080p", pipeline=pipeline,
                value=round(dt * 1e3, 2),
            )
            # Each pixel traces ~9 rays per frame (primary + direct-light
            # visibility + 4 roulette plane marches + 4 light re-samples,
            # SURVEY §3.2): the headline counts primaries only; this derived
            # stat is the total traced-ray throughput.
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


def bench_fused_loss_grad(scene, camera, width=1920, height=1080):
    """The single-kernel fused loss+gradient step (ops/loss_kernel.py): the
    honest fwd+bwd of the mean-pixel loss with forward, composite, loss and
    backward in ONE device program — the BASELINE.json fwd+bwd metric's
    best path. The generic custom-VJP number is reported separately."""
    from kylespathtracer_tpu.ops import loss_kernel as lk

    config = RenderConfig(
        width=width, height=height, no_history=True, pipeline="fused"
    )

    def make_scan(K):
        @jax.jit
        def run(scene):
            def body(acc, i):
                v, g = lk.render_loss_and_grad(
                    scene, camera, i, config, loss="mean"
                )
                return acc + v + jnp.sum(g[1]), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.int32)
            )
            return acc

        return lambda: run(scene)

    try:
        # Wider K range than the generic bench: at ~11 ms/step the
        # rtt-noise on the K=2 total was tripping the 20% linearity
        # gate (BENCH_r04 mid-round run).
        dt = _timed_scan(make_scan, (4, 16, 28), "fwd_bwd_fused_loss")
        stderr_json(
            metric="fwd_bwd_rays_per_s_1080p",
            value=round(width * height / dt, 1),
            frame_ms=round(dt * 1e3, 2),
            pipeline="fused_loss_kernel",
        )
        return width * height / dt
    except Exception as e:  # pragma: no cover
        stderr_json(metric="fwd_bwd_fused_loss_error", error=str(e)[:200])
        return None


def _bench_fwd_bwd_one(scene, camera, rtt, width, height, iters, pipeline):
    config = RenderConfig(
        width=width, height=height, no_history=True, pipeline=pipeline
    )
    history = init_history(config, camera)

    def loss_fn(scene, camera, history, frame):
        img, _ = render_frame(scene, camera, history, frame, config)
        return jnp.mean(img)

    vg = jax.value_and_grad(loss_fn, allow_int=True)

    def make_scan(K):
        @jax.jit
        def run(history, scene):
            def body(acc, i):
                v, g = vg(scene, camera, history, i)
                # Fold one float grad leaf in so the backward stays live.
                return acc + v + jnp.sum(g.spheres), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.int32)
            )
            return acc

        return lambda: run(history, scene)

    vg_jit = jax.jit(vg)
    v, g = vg_jit(scene, camera, history, jnp.asarray(0, jnp.int32))
    _sync((v, g))
    blocked = _blocked_once(
        lambda i: vg_jit(scene, camera, history, jnp.asarray(i, jnp.int32)),
        iters, rtt,
    )

    dt = _timed_scan(make_scan, (2, 10, 18), "fwd_bwd", blocked_ms=blocked)
    stderr_json(
        metric="fwd_bwd_generic_rays_per_s_1080p",
        value=round(width * height / dt, 1),
        frame_ms=round(dt * 1e3, 2),
        pipeline=pipeline,
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
        out = fn(scene, camera, jnp.asarray(0, jnp.int32))
        _sync(out)
        blocked = _blocked_once(
            lambda i: fn(scene, camera, jnp.asarray(i, jnp.int32)), iters, rtt
        )

        def make_scan(K):
            @jax.jit
            def run(scene, camera):
                def body(acc, i):
                    # `frame` (= i) is a kernel operand, so the opaque
                    # pallas_call is not loop-invariant; `acc` serializes.
                    out = fk.geometry_pass_pallas(scene, camera, i, config)
                    return acc + out["depth"][0, 0], None

                acc, _ = jax.lax.scan(
                    body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.int32)
                )
                return acc

            return lambda: run(scene, camera)

        dt = _timed_scan(make_scan, (8, 40, 72), "raycast", blocked_ms=blocked)
        stderr_json(
            metric="raycast_rays_per_s_1080p",
            value=round(width * height / dt, 1),
            frame_ms=round(dt * 1e3, 2),
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
        img = fn(scene, camera, config, jnp.asarray(0, jnp.int32))
        _sync(img)
        blocked = _blocked_once(
            lambda i: fn(scene, camera, config, jnp.asarray(i, jnp.int32)),
            iters, rtt,
        )

        def make_scan(K):
            @jax.jit
            def run(scene, camera):
                def body(acc, i):
                    img = wf.render_pathtraced(scene, camera, config, i)
                    return acc + img[0, 0, 0], None

                acc, _ = jax.lax.scan(
                    body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.int32)
                )
                return acc

            return lambda: run(scene, camera)

        dt = _timed_scan(make_scan, (1, 4, 7), "wavefront", blocked_ms=blocked)
        segs = width * height * spp * depth
        stderr_json(
            metric="wavefront_segments_per_s_1080p",
            value=round(segs / dt, 1),
            frame_ms=round(dt * 1e3, 2),
            spp=spp, depth=depth,
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
                if _FULL_LOG is not None:  # the full JSONL record too
                    _FULL_LOG.write(line + "\n")
                    _FULL_LOG.flush()
        if out.returncode != 0:
            stderr_json(metric="scaling_error", tail=out.stderr[-200:])
    except Exception as e:  # pragma: no cover
        stderr_json(metric="scaling_error", error=str(e)[:200])


def main():
    global _FULL_LOG
    _FULL_LOG = open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_full_r05.jsonl"),
        "w",
    )
    scene = default_scene()
    camera = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
    rtt = _roundtrip_s()
    stderr_json(metric="host_device_roundtrip_ms", value=round(rtt * 1e3, 2))

    rays_per_s = bench_forward(scene, camera, rtt)
    bench_fused_loss_grad(scene, camera)
    bench_fwd_bwd(scene, camera, rtt)
    bench_raycast(scene, camera, rtt)
    bench_wavefront(scene, camera, rtt)
    bench_scaling()

    headline = json.dumps(
        {
            "metric": "primary_rays_per_s_fwd_1080p",
            "value": round(rays_per_s, 1),
            "unit": "rays/s",
            "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
        }
    )
    print(headline)
    _FULL_LOG.write(headline + "\n")
    _FULL_LOG.close()


if __name__ == "__main__":
    main()
