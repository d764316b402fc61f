"""Windowed-select reprojection kernel (ops/reproject_kernel.py) vs the
exact XLA gather: identical where the 2x2 taps are fully inside the window,
zero history beyond it."""

import numpy as np
import jax.numpy as jnp

from kylespathtracer_tpu.ops import reproject_kernel as rk
from kylespathtracer_tpu.render import reproject as rep_mod
from kylespathtracer_tpu.render.camera import Camera
from kylespathtracer_tpu.render.passes import Channel
from kylespathtracer_tpu.render.reproject import reproject_query

H, W = 32, 48
K = 8


def _channels(rng):
    return Channel(
        rgb=jnp.asarray(rng.random((H, W, 3), np.float32)),
        cnt=jnp.asarray(rng.integers(0, 16, (H, W)).astype(np.float32)),
        oid=jnp.asarray(rng.integers(0, 4, (H, W)).astype(np.int32)),
    )


def test_windowed_matches_gather_within_window():
    rng = np.random.default_rng(0)
    prev_cam = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
    # Random anchors: some reproject nearby (covered), some far (dropped).
    hl = jnp.asarray(
        rng.normal(0, 2, (H, W, 3)).astype(np.float32)
        + np.array([0, 0, 5], np.float32)
    )
    sl = hl + 0.1
    ho = jnp.asarray(rng.integers(0, 4, (H, W)).astype(np.int32))
    pd, ps = _channels(rng), _channels(rng)

    (rd_w, cd_w), (rs_w, cs_w) = rk.reproject_pallas(
        prev_cam, hl, sl, ho, pd, ps, 1.5, window=K, interpret=True
    )
    rd_x, cd_x = rep_mod.reproject(
        prev_cam.loc, prev_cam.orient, hl, ho, pd.rgb, pd.cnt, pd.oid, 1.5
    )

    iuv, _, _ = reproject_query(prev_cam.loc, prev_cam.orient, hl, 1.5, (H, W))
    gy = np.arange(H)[:, None]
    gx = np.arange(W)[None, :]
    dy = np.asarray(iuv[..., 1]) - gy
    dx = np.asarray(iuv[..., 0]) - gx
    # Full 2x2 coverage needs both taps inside [-K, K].
    full = (dy >= -K) & (dy <= K - 1) & (dx >= -K) & (dx <= K - 1)
    beyond = (np.abs(dy) > K + 1) | (np.abs(dx) > K + 1)

    assert full.any() and beyond.any()
    np.testing.assert_allclose(
        np.asarray(rd_w)[full], np.asarray(rd_x)[full], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cd_w)[full], np.asarray(cd_x)[full], atol=1e-5
    )
    # Beyond the window the history restarts: zero weight.
    assert np.abs(np.asarray(cd_w)[beyond]).max() == 0.0
    assert np.abs(np.asarray(rd_w)[beyond]).max() == 0.0


def test_identity_motion_is_exact():
    """Static camera reprojects every pixel onto itself: windowed == gather
    everywhere (the fused pipeline's steady-state case)."""
    rng = np.random.default_rng(1)
    prev_cam = Camera.create(loc=(3.0, 2.0, -3.0), orient=(0.0, 0.7))
    from kylespathtracer_tpu.render.camera import ray_dirs

    rd = ray_dirs(prev_cam, W, H)
    hl = prev_cam.loc + rd * 5.0
    ho = jnp.asarray(rng.integers(0, 4, (H, W)).astype(np.int32))
    pd, ps = _channels(rng), _channels(rng)

    (rd_w, cd_w), _ = rk.reproject_pallas(
        prev_cam, hl, hl, ho, pd, ps, 1.5, window=K, interpret=True
    )
    rd_x, cd_x = rep_mod.reproject(
        prev_cam.loc, prev_cam.orient, hl, ho, pd.rgb, pd.cnt, pd.oid, 1.5
    )
    np.testing.assert_allclose(np.asarray(rd_w), np.asarray(rd_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cd_w), np.asarray(cd_x), atol=1e-5)
