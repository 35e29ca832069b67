"""Deferred (visibility-buffer) renderer, motion vectors, upscaler,
Atomic Loop 64 — reference `src/Renderers/Deferred/DeferredRenderer.*`,
`src/Renderers/OIT/AtomicLoop64Renderer.cpp:283`."""

import pytest
import numpy as np
import jax.numpy as jnp

from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.tube_raster import build_capsule_scene

W, H = 96, 64


def _scene(seed=3, radius=0.03):
    rng = np.random.default_rng(seed)
    L, P = 6, 10
    pos = np.cumsum(rng.normal(0, 0.07, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    mask = np.ones((L, P), bool)
    attrs = rng.uniform(0, 1, (L, P)).astype(np.float32)
    return build_capsule_scene(pos, mask, attrs, radius=radius)


def _settings():
    return RasterSettings(width=W, height=H, tile_w=16, tile_h=8, chunk=32,
                          span_x=3, span_y=3)


def _cam(pos=(0.0, 0.1, 1.2)):
    return Camera(position=pos, look_at_point=(0, 0, 0), width=W, height=H)


def test_deferred_matches_forward_opaque():
    """Same kernel + same resolve -> bit-identical to the opaque path."""
    from linevis_tpu.render.deferred import render_tubes_deferred
    from linevis_tpu.render.tube_raster import (
        _proj_constants,
        render_tubes,
    )

    scene = _scene()
    cam = _cam()
    args = (
        jnp.asarray(cam.view_projection_matrix()),
        jnp.asarray(np.asarray(cam.position, np.float32)),
        jnp.asarray(_proj_constants(cam)),
        _settings(),
    )
    a = np.asarray(render_tubes(scene, *args))
    b = np.asarray(render_tubes_deferred(scene, *args))
    np.testing.assert_array_equal(a, b)


def test_motion_vectors_static_and_panning():
    from linevis_tpu.render.deferred import render_tubes_deferred
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = _scene()
    cam = _cam()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    pa = jnp.asarray(_proj_constants(cam))

    # Same camera for prev + current: zero motion everywhere.
    img, mv = render_tubes_deferred(
        scene, vp, cp, pa, _settings(), prev_view_proj=vp, with_motion=True
    )
    mv = np.asarray(mv)
    fg = np.asarray(img)[3] > 0.999  # foreground alpha is 1
    assert np.abs(mv).max() < 1e-3

    # Camera PANNED right between frames (position + look-at move
    # together; a pure look-at translation would re-aim and cancel the
    # shift at the target): visible points project further LEFT in the
    # current frame than the previous one -> negative x motion.
    prev_cam = Camera(position=(-0.05, 0.1, 1.2),
                      look_at_point=(-0.05, 0, 0), width=W, height=H)
    prev_vp = jnp.asarray(prev_cam.view_projection_matrix())
    img2, mv2 = render_tubes_deferred(
        scene, vp, cp, pa, _settings(), prev_view_proj=prev_vp,
        with_motion=True,
    )
    mv2 = np.asarray(mv2)
    # Background pixels report exactly zero motion (and the white
    # background has alpha 1 too, so mask on the motion itself).
    fg2 = (mv2 != 0.0).any(axis=0)
    assert fg2.sum() > 50
    assert mv2[0][fg2].mean() < -0.5, mv2[0][fg2].mean()
    assert abs(mv2[1][fg2].mean()) < abs(mv2[0][fg2].mean()) * 0.5


@pytest.mark.slow
def test_temporal_upscaler_converges_static():
    """Static scene + zero motion: history converges to the (constant)
    upsampled input and stays clamped within its neighborhood."""
    from linevis_tpu.render.deferred import TemporalUpscaler

    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.uniform(0, 1, (3, 16, 24)).astype(np.float32))
    mv = jnp.zeros((2, 16, 24), jnp.float32)
    up = TemporalUpscaler(scale=2, blend=0.5)
    out = None
    for _ in range(6):
        out = up.step(low, mv)
    out = np.asarray(out)
    assert out.shape == (3, 32, 48)
    assert np.isfinite(out).all()
    # Fixed input + zero motion: the exponential history converges to the
    # upsampled current frame (the clamp is a no-op at the fixed point).
    import jax.image

    ref = np.asarray(
        jax.image.resize(low, (3, 32, 48), method="bilinear")
    )
    np.testing.assert_allclose(out, ref, atol=2e-2)


@pytest.mark.slow
def test_deferred_renderer_mode_and_upscaling():
    from linevis_tpu.core.settings import SettingsMap
    from linevis_tpu.core.trajectories import Trajectories
    from linevis_tpu.render.renderer import create_renderer
    from linevis_tpu.scene.line_data import LineData

    rng = np.random.default_rng(5)
    L, P = 4, 8
    pos = np.cumsum(rng.normal(0, 0.06, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    traj = Trajectories(
        positions=pos,
        attributes=rng.uniform(0, 1, (L, 1, P)).astype(np.float32),
        mask=np.ones((L, P), bool),
        num_points=np.full((L,), P, np.int32),
        attribute_names=["a"],
    )
    ld = LineData(traj)
    ld.set_line_width(0.04)
    r = create_renderer("Deferred Opaque")
    r.set_line_data(ld)
    cam = _cam()
    a = r.render(cam)
    assert a.shape == (H, W, 4)
    assert r.last_motion is not None

    r2 = create_renderer("Deferred Opaque")
    r2.set_line_data(ld)
    r2.set_new_settings(SettingsMap({"upscaling_factor": 2}))
    b = r2.render(cam)
    b = r2.render(cam)
    assert b.shape == (H, W, 4)
    assert np.isfinite(b).all()


@pytest.mark.slow
def test_atomic_loop_matches_mlab_at_low_complexity():
    """Depth complexity <= K: the exact K-buffer equals MLAB (no merges
    ever happen), both equal the reference's converged atomic loop."""
    from linevis_tpu.render.oit import (
        render_tubes_atomic_loop,
        render_tubes_mlab,
    )
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = _scene(radius=0.02)
    cam = _cam()
    args = (
        jnp.asarray(cam.view_projection_matrix()),
        jnp.asarray(np.asarray(cam.position, np.float32)),
        jnp.asarray(_proj_constants(cam)),
        _settings(),
    )
    a = np.asarray(render_tubes_atomic_loop(scene, *args, K=16, opacity=0.4))
    b = np.asarray(render_tubes_mlab(scene, *args, K=16, opacity=0.4))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_atomic_loop_renderer_mode():
    from linevis_tpu.core.trajectories import Trajectories
    from linevis_tpu.render.renderer import create_renderer
    from linevis_tpu.scene.line_data import LineData

    rng = np.random.default_rng(9)
    L, P = 4, 8
    pos = np.cumsum(rng.normal(0, 0.06, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    traj = Trajectories(
        positions=pos,
        attributes=rng.uniform(0, 1, (L, 1, P)).astype(np.float32),
        mask=np.ones((L, P), bool),
        num_points=np.full((L,), P, np.int32),
        attribute_names=["a"],
    )
    ld = LineData(traj)
    ld.set_line_width(0.05)
    r = create_renderer("Atomic Loop 64-Bit")
    r.set_line_data(ld)
    out = r.render(_cam())
    assert out.shape == (H, W, 4)
    assert np.isfinite(out).all()
