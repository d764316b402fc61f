"""Real-`pallas_call` coverage in the default gate (round-4 verdict item).

Each kernel family runs its actual `pl.pallas_call` (interpret mode) at a
tiny multi-block resolution and is checked against its jnp twin — so a
BlockSpec/operand-order/grid regression (round 2's failure class) is
caught by `pytest` without `-m slow`. This file runs ~6-7 min on the
2-core CI box — the temporal-kernel test below is the expensive one
(~2.5 min of interpret-mode evaluation), kept in the default gate
deliberately: it is the only default-gate witness of the production
temporal kernel's halo/liveness behavior (round-4 verdict item 1). The
heavyweight interpret tests (backward kernel, full-frame parity at larger
sizes, multihost) remain in `-m slow`. One exception in this file:
test_loss_kernel_pallas_call is slow-marked (its interpret-mode vjp costs
minutes; the loss math has fast coverage in tests/test_loss_kernel.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kylespathtracer_tpu.ops import frame_kernel as fk
from kylespathtracer_tpu.ops import reproject_kernel as rk
from kylespathtracer_tpu.render import reproject as rep_mod
from kylespathtracer_tpu.render.camera import Camera, ray_dirs
from kylespathtracer_tpu.render.passes import Channel
from kylespathtracer_tpu.scene import default_scene
from kylespathtracer_tpu.utils.config import RenderConfig

SCENE = default_scene()
CAM = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
FRAME = jnp.asarray(0, jnp.int32)


def test_geometry_kernel_pallas_call():
    """Geometry kernel (2 row blocks) == the jnp twin's geometry planes."""
    cfg = RenderConfig(width=128, height=64)
    out = fk.geometry_pass_pallas(SCENE, CAM, FRAME, cfg, block_rows=32,
                                  interpret=True)
    ref = fk.frame_forward_jnp(SCENE, CAM, FRAME, cfg)
    assert (np.asarray(out["oid"]) == np.asarray(ref["oid"])).all()
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["curv"]), np.asarray(ref["curv"]), atol=1e-6
    )


def test_frame_kernel_pallas_call():
    """Fused forward kernel (2 row blocks) == frame_forward_jnp."""
    cfg = RenderConfig(width=128, height=16)
    out = fk.frame_forward_pallas(SCENE, CAM, FRAME, cfg, block_rows=8,
                                  interpret=True)
    ref = fk.frame_forward_jnp(SCENE, CAM, FRAME, cfg)
    for k in ("add_d", "add_s", "alb", "ene", "depth", "curv"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), atol=2e-5, err_msg=k
        )
    assert (np.asarray(out["oid"]) == np.asarray(ref["oid"])).all()


def test_frame_kernel_column_blocks():
    """The 2-D (block_rows, block_cols) grid of the forward kernel — the
    production shape is (8,640) at widths 640 divides (auto-selected; it
    runs ~15% faster than full-width rows on the v5e) — must match the
    1-D full-width grid to float-association ulps (the per-pixel math is
    identical; only the compiler's shape-dependent fma fusion differs).
    Exercises the j-grid col0 offset and the column padding/crop at a
    width block_cols does NOT divide."""
    cfg = RenderConfig(width=192, height=16)
    full = fk.frame_forward_pallas(SCENE, CAM, FRAME, cfg, block_rows=8,
                                   block_cols=cfg.width, interpret=True)
    split = fk.frame_forward_pallas(SCENE, CAM, FRAME, cfg, block_rows=8,
                                    block_cols=128, interpret=True)
    assert (np.asarray(full["oid"]) == np.asarray(split["oid"])).all()
    for k in ("add_d", "add_s", "alb", "ene", "depth", "curv"):
        np.testing.assert_allclose(
            np.asarray(full[k]), np.asarray(split[k]), atol=2e-5, rtol=1e-5,
            err_msg=k,
        )


def test_reproject_kernel_tile_mode():
    """Tile mode of the windowed reprojection kernel (the sharded split
    path, parallel/shard.py): two 16-row tiles, each with an 8-row halo
    window cut from the full history, must reproduce the full-frame kernel
    exactly — covers the hb-offset BlockSpecs, the global-row queries
    (row0), and the zero edge halos."""
    W, H = 128, 32
    cfg = RenderConfig(width=W, height=H)
    gb = fk.frame_forward_jnp(SCENE, CAM, FRAME, cfg)
    rd = ray_dirs(CAM, W, H, cfg.fov)
    hl = CAM.loc + rd * gb["depth"][..., None]
    ho = gb["oid"]
    rng = np.random.default_rng(3)
    ch = Channel(
        rgb=jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32),
        cnt=jnp.asarray(rng.integers(1, 5, (H, W)).astype(np.float32)),
        oid=ho,
    )
    prev = CAM.replace(
        orient=CAM.orient + jnp.asarray([-0.02, 0.003], jnp.float32),
    )
    (rgb_f, cnt_f), _ = rk.reproject_pallas(
        prev, hl, hl, ho, ch, ch, cfg.fov, window=4, block_rows=8,
        interpret=True,
    )

    def window(c, r0, rows, halo):
        def w(a):
            ap = jnp.pad(a, ((halo, halo),) + ((0, 0),) * (a.ndim - 1))
            return ap[r0:r0 + rows + 2 * halo]
        return Channel(rgb=w(c.rgb), cnt=w(c.cnt), oid=w(c.oid))

    parts = []
    for r0 in (0, 16):
        wch = window(ch, r0, 16, 8)
        (rgb_t, cnt_t), _ = rk.reproject_pallas(
            prev, hl[r0:r0 + 16], hl[r0:r0 + 16], ho[r0:r0 + 16],
            wch, wch, cfg.fov, window=4, block_rows=8, interpret=True,
            image_height=H, row_base=r0, hist_halo=8,
        )
        parts.append((np.asarray(rgb_t), np.asarray(cnt_t)))
    np.testing.assert_array_equal(
        np.concatenate([p[0] for p in parts], axis=0), np.asarray(rgb_f)
    )
    np.testing.assert_array_equal(
        np.concatenate([p[1] for p in parts], axis=0), np.asarray(cnt_f)
    )


def test_reproject_kernel_pallas_call():
    """Windowed reprojection (2 row blocks + halo) == the exact XLA gather
    for sub-window camera motion on real hit geometry."""
    W, H = 128, 16
    cfg = RenderConfig(width=W, height=H)
    gb = fk.frame_forward_jnp(SCENE, CAM, FRAME, cfg)
    rd = ray_dirs(CAM, W, H, cfg.fov)
    hl = CAM.loc + rd * gb["depth"][..., None]
    ho = gb["oid"]

    rng = np.random.default_rng(0)
    ch = Channel(
        rgb=jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32),
        cnt=jnp.asarray(rng.integers(1, 5, (H, W)).astype(np.float32)),
        oid=ho,
    )
    prev = CAM.replace(
        loc=CAM.loc + jnp.asarray([0.002, -0.001, 0.001], jnp.float32),
        orient=CAM.orient + jnp.asarray([1e-4, -2e-4], jnp.float32),
    )
    (rgb_k, cnt_k), _ = rk.reproject_pallas(
        prev, hl, hl, ho, ch, ch, cfg.fov, window=4, block_rows=8,
        interpret=True,
    )
    rgb_x, cnt_x = rep_mod.reproject(
        prev.loc, prev.orient, hl, ho, ch.rgb, ch.cnt, ch.oid, cfg.fov
    )
    np.testing.assert_allclose(
        np.asarray(rgb_k), np.asarray(rgb_x), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cnt_k), np.asarray(cnt_x), atol=1e-4
    )


def _frame_hist_oracle(scene, cam, prev_cam, hist_d, hist_s, frame, cfg):
    """The unfused temporal chain the fused kernel replaced: frame_block
    (jnp twin) + exact XLA reprojection gather + floor + velocity clamp +
    accumulate — the components ops/frame_hist.py fused (reference:
    common.glsl:661-694, diffuse.frag:45-51, specular.frag:45-49).

    The count floor mirrors the kernel's documented epsilon
    (ops/frame_hist.py `floor(cnt + 1e-4)`): both sides compute integer
    counts up to float association, so the eps only de-flakes the shared
    knife edge — it does not paper over halo or liveness bugs."""
    from kylespathtracer_tpu.core import gmath
    from kylespathtracer_tpu.render.passes import _temporal_clamp

    out = fk.frame_forward_jnp(scene, cam, frame, cfg)
    rd = ray_dirs(cam, cfg.width, cfg.height, cfg.fov)
    hl = cam.loc + rd * out["depth"][..., None]
    light_dist = gmath.length(hl - scene.light[:3])
    fac = gmath.EPS / jnp.sqrt(jnp.maximum(gmath.EPS, out["curv"]))
    sl = hl + rd * (light_dist * fac)[..., None]
    vv = gmath.length(cam.loc - prev_cam.loc)
    oid = out["oid"]

    def one(ch, anchor, add):
        rgb, cnt = rep_mod.reproject(
            prev_cam.loc, prev_cam.orient, anchor, oid,
            ch.rgb, ch.cnt, ch.oid, cfg.fov,
        )
        cnt = jnp.floor(cnt + 1e-4)
        rgb, cnt = _temporal_clamp(rgb, cnt, vv, cfg)
        return rgb + add, cnt + 1.0

    d_rgb, d_cnt = one(hist_d, hl, out["add_d"])
    s_rgb, s_cnt = one(hist_s, sl, out["add_s"])
    return {
        "d_rgb": d_rgb, "d_cnt": d_cnt, "s_rgb": s_rgb, "s_cnt": s_cnt,
        "alb": out["alb"], "ene": out["ene"], "oid": oid,
        "_anchor_d": hl,
    }


def test_frame_hist_kernel_pallas_call():
    """The production fused temporal kernel (ops/frame_hist.py — the thing
    the headline frame time measures) with a POPULATED history and a ~1.5 px
    camera pan, against the unfused chain it replaced. 6 row blocks of 8:
    the pan makes taps cross the block halo (o=±1 shifted-BlockSpec reads),
    the camera translation activates the velocity clamp, and border pixels
    exercise the negative-bilinear-weight taps (the `!= 0` liveness masks,
    ops/frame_hist.py:133-139). Catches halo-BlockSpec, liveness-bound, and
    floor-epsilon regressions in the default gate."""
    from kylespathtracer_tpu.ops import frame_hist as fh
    from kylespathtracer_tpu.render.reproject import reproject_query

    W, H = 128, 32
    cfg = RenderConfig(width=W, height=H, reproject_window=2)
    prev_cam = CAM
    # ~1.5 px up + ~0.5 px sideways (Δpx ≈ 0.5·H·fov·θ at this size), plus a
    # small translation so vv > 0 and the velocity clamp engages. Chosen so
    # every live tap stays inside the K=2 window (the coverage asserts below
    # verify this — beyond-window taps drop history by design and would make
    # the exact-gather oracle diverge for the wrong reason).
    cam = CAM.replace(
        orient=CAM.orient + jnp.asarray([-0.03, 0.004], jnp.float32),
        loc=CAM.loc + jnp.asarray([0.001, -0.0015, 0.001], jnp.float32),
    )

    # History populated from the PREVIOUS camera's geometry so the tap
    # ID-match test passes/fails exactly like a real accumulated frame.
    prev_oid = fk.frame_forward_jnp(SCENE, prev_cam, FRAME, cfg)["oid"]
    rng = np.random.default_rng(7)

    def channel(seed):
        r = np.random.default_rng(seed)
        return Channel(
            rgb=jnp.asarray(r.uniform(0.0, 2.0, (H, W, 3)), jnp.float32),
            cnt=jnp.asarray(r.integers(0, 17, (H, W)).astype(np.float32)),
            oid=prev_oid,
        )

    hist_d, hist_s = channel(1), channel(2)

    out = fh.frame_hist_pallas(
        SCENE, cam, prev_cam, hist_d, hist_s, FRAME, cfg,
        block_rows=8, interpret=True,
    )
    ref = _frame_hist_oracle(SCENE, cam, prev_cam, hist_d, hist_s, FRAME, cfg)

    # The pan must actually cross row-block boundaries (halo reads) and
    # produce negative bilinear fractions somewhere — otherwise this test
    # would silently stop covering the halo BlockSpecs — and every live tap
    # must stay inside the K window or the oracle diverges by design.
    iuv, duv, inside = reproject_query(
        prev_cam.loc, prev_cam.orient, ref["_anchor_d"], cfg.fov, (H, W)
    )
    py = np.arange(H)[:, None] + np.zeros((H, W), np.int64)
    px = np.arange(W)[None, :] + np.zeros((H, W), np.int64)
    iv, iu = np.asarray(iuv[..., 1]), np.asarray(iuv[..., 0])
    live = np.asarray(inside) & (iv >= -1) & (iv < H) & (iu >= -1) & (iu < W)
    dy, dx = (iv - py)[live], (iu - px)[live]
    K = cfg.reproject_window
    assert dy.min() >= -K and dy.max() <= K - 1, "taps beyond K; fix the pan"
    assert dx.min() >= -K and dx.max() <= K - 1, "taps beyond K; fix the pan"
    crosses = (iv // 8 != py // 8) & live
    assert crosses.any(), "pan no longer crosses a block halo; fix the test"
    assert (np.asarray(duv)[live] < 0).any(), "no negative bilinear fractions"

    # rgb tolerance: the kernel accumulates per-(o,l) select terms, the
    # oracle nested-mixes 4 taps — same sum, different association (~1e-4
    # on history values up to ~2 x count 16).
    for k in ("d_rgb", "d_cnt", "s_rgb", "s_cnt", "alb", "ene"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), atol=2e-4, rtol=1e-5,
            err_msg=k,
        )
    assert (np.asarray(out["oid"]) == np.asarray(ref["oid"])).all()


@pytest.mark.slow
def test_loss_kernel_pallas_call():
    """The fused loss+gradient kernel (2-block interpret grid) returns the
    jnp twin's MSE loss value and scene gradients — validates the in-kernel
    composite, target-plane BlockSpecs, the (1,1) loss accumulator and the
    cross-block gradient accumulation. slow: interpret-mode evaluation of
    the vjp'd block function runs minutes on the CI box (same cost class as
    test_frame_grad's slow backward test — the kernel body is frame_block +
    jax.vjp, far beyond the small-test budget); the loss kernel's MATH is
    covered fast by tests/test_loss_kernel.py."""
    from kylespathtracer_tpu.ops import loss_kernel as lk

    H, W = 16, 128
    cfg = RenderConfig(width=W, height=H, no_history=True, soft_shadows=0.05)
    target = jnp.full((H, W, 3), 0.3, jnp.float32)
    lval, (d_scene, _) = lk.loss_and_grad(
        SCENE, CAM, FRAME, cfg, target=target, interpret=True
    )

    def loss_jnp(scene):
        out = fk.frame_forward_jnp(scene, CAM, FRAME, cfg)
        img = lk._composite_planes(
            tuple(out["alb"][..., c] for c in range(3)),
            tuple(out["ene"][..., c] for c in range(2)),
            tuple(out["add_d"][..., c] for c in range(3)),
            tuple(out["add_s"][..., c] for c in range(3)),
            cfg.brightness,
        )
        acc = jnp.float32(0.0)
        for c in range(3):
            acc = acc + jnp.sum((img[c] - target[..., c]) ** 2)
        return acc / float(H * W * 3)

    v_ref = loss_jnp(SCENE)
    np.testing.assert_allclose(float(lval), float(v_ref), rtol=1e-5)
    g_ref = jax.grad(loss_jnp, allow_int=True)(SCENE)
    for name in ("planes", "spheres", "light_color"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(d_scene, name))
        np.testing.assert_allclose(
            b, a, atol=1e-4 * (np.abs(a).max() + 1e-6), err_msg=name
        )


def test_path_kernel_pallas_call():
    """Wavefront path kernel == the lax.scan integrator at depth 2."""
    from kylespathtracer_tpu.render import wavefront as wf

    cfg_p = RenderConfig(width=128, height=16, spp=1, max_depth=2,
                         path_backend="pallas")
    cfg_x = RenderConfig(width=128, height=16, spp=1, max_depth=2,
                         path_backend="xla")
    img_p = wf.render_pathtraced(SCENE, CAM, cfg_p, FRAME)
    img_x = wf.render_pathtraced(SCENE, CAM, cfg_x, FRAME)
    d = np.abs(np.asarray(img_p) - np.asarray(img_x))
    assert np.isfinite(np.asarray(img_p)).all()
    assert np.median(d) < 1e-5
    assert (d > 3e-2).mean() < 0.02
