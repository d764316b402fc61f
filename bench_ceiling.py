"""Measure the VPU op-throughput ceiling for the frame kernel's op MIX.

Round-4 verdict item 3: the roofline story claimed both hot kernels run at
~2.3 T effective vector op/s against a stated (unmeasured) 7 T ceiling,
"scheduler-limited". This harness measures what rate THIS op mix can
actually sustain on the attached chip, so "the frame is at speed of light"
becomes a measurement instead of an assertion.

Method: a Pallas kernel whose unrolled inner loop reproduces the measured
primitive mix of `frame_kernel.frame_block` (jaxpr histogram at 1080p,
vector ops on (8,1920) f32 planes, pseudo-ops excluded):

    mul 27%  add 19%  sub 8%  select 11%  max/min 10%  compare 11%
    and/or 6%  abs/neg/floor 4%  div 1.6%  sqrt+rsqrt 1.2%

as a 64-op template, iterated I times over C independent dependency
chains (C sweeps instruction-level parallelism: real code sits between
C=1 serial chains and C=8 fully parallel streams). A pure mul/add (fma)
variant bounds the absolute ALU ceiling. All operands are data-dependent
(loaded from HBM, carried through the scan) so nothing folds. Timing uses
the same device-resident scan-slope method as bench.py; ops/s =
blocks x elements x I x C x 64 / slope.

Writes CEILING_r{N}.json and prints one JSON line per variant.

Result (2026-08-21, v5e via tunnel — CEILING_r05.json): pure-fma sustains
5.6-5.7 T op/s flat across chain counts; the frame mix 4.0-4.1 T (the
select/compare/bool share runs at ~70% of the fma rate); 96 extra live
planes cost ~15%; bf16 fma is 2.4 T — SLOWER than f32, so half precision
is rejected for vector arithmetic on this chip. The round-4 roofline was
wrong on both ends: the 7 T ceiling was an overstatement AND the shade
kernel's 2.3 T effective was only ~58% of the true 4.0 T mix ceiling —
headroom that round 5 partly banked as the (8,640) block-shape win
(shade 4.89 -> 4.15 ms; see PERF_NOTES.md).
"""

from __future__ import annotations

import functools
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import _sync, _timed_scan  # noqa: E402  (scan-slope harness)

H, W = 1080, 1920
BLOCK = 8


def _template_mix(x, y, k):
    """One 64-op round of the frame kernel's measured primitive mix.

    x is the chain value (serial dependency), y a second live plane; k a
    per-round constant so rounds don't CSE. Counts (mul 17 / add 12 /
    sub 5 / select 7 / max+min 6 / compare 7 / and 4 / abs+neg+floor 3 /
    div 1 / sqrt 1 = 63) follow the jaxpr histogram. Every few ops mix
    x*y products so the chain is NONLINEAR in the carries — a chain of
    constant-affine updates would let the compiler compose the whole round
    into two ops (observed: a pure-affine "fma" probe measured an
    impossible 15 T op/s before this guard)."""
    c1 = 0.6 + 0.05 * k
    # 17 mul, 12 add, 5 sub
    x = x * y + c1
    y = y * 0.75 + x * 0.125
    x = x - y * 0.25
    y = y * x + 0.3
    x = x * 0.5 - y
    y = y + x * 0.0625
    x = x * y + 0.2
    y = y * 0.8 + x
    x = x - y * 0.5
    y = y * x + c1
    x = x * 0.25 + y
    y = y - x * 0.125
    x = x * y + 0.15
    y = y * 0.7 + x
    x = x - y
    y = y + 0.4
    x = x * c1 + y * 0.3
    # 7 compares + 4 and + 7 selects + 3 max + 3 min (the roulette /
    # ID-match logic shape)
    m1 = x > y
    m2 = x < c1
    m3 = y >= 0.0
    m4 = x <= 2.0
    m5 = y != x
    m6 = x > 0.5
    m7 = y < 1.5
    a1 = m1 & m2
    a2 = m3 & m4
    a3 = m5 & m6
    a4 = a1 & m7
    x = jnp.where(a1, x, y)
    y = jnp.where(a2, y, x * 0.5)
    x = jnp.where(a3, x + 0.125, x)
    y = jnp.where(a4, y, 0.0)
    x = jnp.where(m5, x, 1.0)
    y = jnp.where(m6, y, x)
    x = jnp.where(m7, x, y)
    x = jnp.maximum(x, -4.0)
    y = jnp.maximum(y, x * 0.25)
    x = jnp.maximum(x, 0.001)
    x = jnp.minimum(x, 4.0)
    y = jnp.minimum(y, 3.0)
    x = jnp.minimum(x, y + 2.0)
    # 1 abs, 1 neg, 1 floor, 1 div, 1 sqrt
    y = jnp.abs(y)
    x = -x
    y = y - jnp.floor(y * 0.125)
    x = x / (y + 1.5)
    x = jnp.sqrt(jnp.abs(x) + 0.0625)
    return x, y


def _template_fma(x, y, k):
    """Pure mul/add ceiling probe: 64 ops in 16 nonlinear x*y rounds (the
    nonlinearity blocks affine-chain composition; see _template_mix)."""
    c1 = 0.6 + 0.05 * k
    for i in range(16):
        x = x * y + c1   # mul + add
        y = y * 0.65 + x  # mul + add
    return x, y


def _template_fma_bf16(x, y, k):
    """The fma probe in bfloat16 — answers whether half precision buys
    vector-op rate on this chip (it buys HBM/VMEM bytes regardless)."""
    c1 = jnp.bfloat16(0.6 + 0.05 * k)
    x = x.astype(jnp.bfloat16)
    y = y.astype(jnp.bfloat16)
    for i in range(16):
        x = x * y + c1
        y = y * jnp.bfloat16(0.65) + x
    return x.astype(jnp.float32), y.astype(jnp.float32)


TEMPLATES = {
    "frame_mix": _template_mix,
    "fma": _template_fma,
    "fma_bf16": _template_fma_bf16,
}
# Exact vector-op counts of each template (audited by hand against the
# code above; compares/ands/selects/min/max each count as one op).
TEMPLATE_OPS = {"frame_mix": 72, "fma": 64, "fma_bf16": 64}


def _mix_kernel(x_ref, y_ref, o_ref, *, iters, chains, template, live=0):
    fn = TEMPLATES[template]
    xs = [x_ref[:] * (1.0 + 0.0625 * c) for c in range(chains)]
    ys = [y_ref[:] + 0.03125 * c for c in range(chains)]
    # `live` extra planes stay live across the whole loop and are each
    # consumed once per sweep — models the shade kernel's register/VMEM
    # pressure (its block function holds ~10^2 live (8,W) planes, where
    # the bare mix loop holds ~4; vector-register spills are the prime
    # suspect for the kernel's rate sitting below the bare-mix ceiling).
    planes = [
        x_ref[:] * (0.5 + 0.01 * j) + y_ref[:] * 0.125 for j in range(live)
    ]
    for i in range(iters):
        for c in range(chains):
            xs[c], ys[c] = fn(xs[c], ys[c], (i * chains + c) % 7)
        if live:
            j = i % live
            planes[j] = planes[j] + xs[0] * 1e-6
    acc = xs[0]
    for c in range(1, chains):
        acc = acc + xs[c]
    for c in range(chains):
        acc = acc + ys[c] * 0.001
    for j in range(live):
        acc = acc + planes[j] * 1e-6
    o_ref[:] = acc


def run_variant(template: str, iters: int, chains: int, live: int = 0):
    nb = H // BLOCK
    img = lambda: pl.BlockSpec(
        (BLOCK, W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _mix_kernel, iters=iters, chains=chains, template=template, live=live,
    )
    f32 = jax.ShapeDtypeStruct((H, W), jnp.float32)

    def call(x, y):
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[img(), img()],
            out_specs=img(),
            out_shape=f32,
        )(x, y)

    x0 = jnp.linspace(0.1, 1.9, H * W, dtype=jnp.float32).reshape(H, W)
    y0 = jnp.linspace(1.7, 0.2, H * W, dtype=jnp.float32).reshape(H, W)

    def make_scan(K):
        @jax.jit
        def run(x, y):
            def body(carry, _):
                x, acc = carry
                o = call(x, y)
                # Feed the output back in: the scan carry serializes reps.
                return (o * 1e-6 + 0.5, acc + o[0, 0]), None

            (xf, acc), _ = jax.lax.scan(
                body, (x, jnp.float32(0.0)), None, length=K
            )
            return acc + xf[0, 0]

        return lambda: run(x0, y0)

    # Each rep is only ~1.5-3 ms of device time; with the ~27 ms tunnel
    # rtt the totals must be O(100 ms) for a stable slope.
    slope = _timed_scan(
        make_scan, (16, 64, 112), f"ceiling_{template}_c{chains}_l{live}",
        reps=4,
    )
    ops = nb * BLOCK * W * iters * chains * TEMPLATE_OPS[template]
    return ops / slope


def main():
    results = []
    # iters x chains held to a roughly constant total op count (~10k/px,
    # the shade core's scale) so each rep costs a measurable ~2-5 ms.
    for template, sweeps in (
        ("fma", ((40, 1, 0), (20, 2, 0), (10, 4, 0), (5, 8, 0))),
        ("fma_bf16", ((40, 1, 0), (10, 4, 0))),
        ("frame_mix", ((40, 1, 0), (20, 2, 0), (10, 4, 0), (5, 8, 0),
                       (20, 2, 16), (20, 2, 32), (20, 2, 64), (20, 2, 96))),
    ):
        for iters, chains, live in sweeps:
            tops = run_variant(template, iters, chains, live)
            rec = {
                "metric": "vpu_ceiling_ops_per_s",
                "template": template,
                "chains": chains,
                "iters": iters,
                "live_planes": live,
                "ops_per_px": iters * chains * TEMPLATE_OPS[template],
                "value": round(tops, -9),
                "teraops": round(tops / 1e12, 3),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    best = {
        t: max(r["teraops"] for r in results if r["template"] == t)
        for t in ("fma", "frame_mix")
    }
    summary = {
        "metric": "vpu_ceiling_summary",
        "best_fma_teraops": best["fma"],
        "best_frame_mix_teraops": best["frame_mix"],
        "mix_vs_fma": round(best["frame_mix"] / best["fma"], 3),
        "note": (
            "frame kernel measured ~2.3 T effective op/s (PERF_NOTES); "
            "ratio to best_frame_mix_teraops is its distance from the "
            "speed of light for its own op mix"
        ),
    }
    print(json.dumps(summary), flush=True)
    out = {"results": results, "summary": summary}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "CEILING_r05.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
