"""Opacity optimization: behavioral tests of the decoupled solve."""

import numpy as np
import jax.numpy as jnp

from linevis_tpu.render.camera import Camera
from linevis_tpu.render.opacity_optimization import (
    OpacityOptimizationRenderer,
    OpacityOptimizationSettings,
)
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.tube_raster import build_capsule_scene

W, H = 32, 16


def _scene_occluder():
    """A high-importance line in front of many low-importance lines."""
    n_back = 4
    pos = np.zeros((n_back + 1, 2, 3), np.float32)
    attrs = np.zeros((n_back + 1, 2), np.float32)
    for i in range(n_back):
        pos[i, 0] = (-0.4, -0.15 + 0.08 * i, 0.0)
        pos[i, 1] = (0.4, -0.15 + 0.08 * i, 0.0)
        attrs[i] = 0.1  # unimportant
    pos[n_back, 0] = (-0.4, 0.0, 0.3)  # in front
    pos[n_back, 1] = (0.4, 0.0, 0.3)
    attrs[n_back] = 0.95  # important
    mask = np.ones((n_back + 1, 2), bool)
    return build_capsule_scene(pos, mask, attrs, radius=0.05), n_back + 1, 2


def test_unimportant_occluders_fade():
    scene, L, P = _scene_occluder()
    cam = Camera(position=(0.0, 0.0, 1.6), width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8, chunk=8,
                       span_x=3, span_y=3)
    oo = OpacityOptimizationSettings(s=4, gather_k=4, render_k=4,
                                     opacity_resolution_scale=1.0,
                                     temporal_smoothing=0.5)
    r = OpacityOptimizationRenderer(scene, L, P, S, oo)
    for _ in range(3):
        img = r.render(cam)
    vo = np.asarray(r.vertex_opacity)
    # The important front line keeps high opacity; the unimportant line that
    # crosses in front of nothing important... in this scene the front line
    # is IMPORTANT and the back lines it occludes are not, so the back lines
    # matter little; importance g=0.95 line must stay nearly opaque.
    assert vo[L - 1].mean() > 0.5, vo[L - 1]
    # Unimportant lines occluding/occluded around an important one fade.
    assert vo[: L - 1].mean() < vo[L - 1].mean()
    img = np.moveaxis(np.asarray(img), 0, -1)
    assert np.isfinite(img).all()
    assert img.shape == (H, W, 4)


def test_opacity_solve_formula():
    """Zero importance everywhere with q,r>0 -> fragments become opaque
    (no energy term); importance contrast creates opacity contrast."""
    scene, L, P = _scene_occluder()
    cam = Camera(position=(0.0, 0.0, 1.6), width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8, chunk=8,
                       span_x=3, span_y=3)
    # q=r=0 -> alpha = 1 everywhere.
    oo = OpacityOptimizationSettings(q=0.0, r=0.0, s=0, gather_k=4, render_k=4,
                                     opacity_resolution_scale=1.0,
                                     temporal_smoothing=1.0)
    r = OpacityOptimizationRenderer(scene, L, P, S, oo)
    r.render(cam)
    vo = np.asarray(r.vertex_opacity)
    assert (vo > 0.99).all(), vo.min()


def test_post_move_smoothing_schedule():
    """40 extra solve frames after a camera move; static camera converges
    and then freezes (OpacityOptimizationRenderer.hpp:125-127)."""
    import dataclasses

    import numpy as np

    from linevis_tpu.render.opacity_optimization import (
        OpacityOptimizationRenderer,
    )

    scene, L, P = _scene_occluder()
    cam = Camera(position=(0.0, 0.0, 1.6), width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8, chunk=8,
                       span_x=3, span_y=3)
    oo = OpacityOptimizationSettings(s=2, gather_k=4, render_k=4,
                                     opacity_resolution_scale=1.0)
    r = OpacityOptimizationRenderer(scene, L, P, S, oo)
    assert r.smoothing_frames_remaining == 40
    r.render(cam)
    assert r.smoothing_frames_remaining == 39
    # Static camera: counter decrements, never resets.
    r.render(cam)
    assert r.smoothing_frames_remaining == 38
    op_before = np.asarray(r.vertex_opacity).copy()
    # Camera move -> full schedule restarts.
    cam2 = dataclasses.replace(cam, position=(0.1, 0.1, 1.3))
    r.render(cam2)
    assert r.smoothing_frames_remaining == 39
    # Exhausted schedule: opacity stops changing.
    r.smoothing_frames_remaining = 0
    op0 = np.asarray(r.vertex_opacity).copy()
    r.render(cam2)
    np.testing.assert_array_equal(np.asarray(r.vertex_opacity), op0)
