"""Bounded-K OIT fidelity gate (docs/BOUNDED_K_FIDELITY.md).

The full study (`examples/bounded_k_fidelity.py`) runs at the reference's
"very large" depth complexity (avg ~120 / max ~380 per
`PerPixelLinkedListLineRenderer.hpp:44-48`); this gate uses a reduced
scene (still ~40 avg / ~130 max surfaces per pixel) against the exact
re-cast ray-tracer oracle so the slow tier stays tractable, and pins:

* K=32 (the PPLL renderer mode's K) reaches SSIM >= 0.99, and
* fidelity is monotone in K (K=32 strictly beats K=8 on mean error).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from examples.bounded_k_fidelity import deep_scene


@pytest.mark.slow
def test_k32_meets_ssim_bar_at_depth():
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.framebuffer import ssim
    from linevis_tpu.render.oit import (
        render_depth_complexity,
        render_tubes_mlab,
    )
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.ray_tracer import render_tubes_raytraced
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = deep_scene(depth_layers=30, rows=12, clump_layers=70)
    W, H = 48, 40
    cam = Camera(position=(0.0, 0.15, 2.2), look_at_point=(0.0, 0.0, 0.0),
                 width=W, height=H)
    settings = RasterSettings(width=W, height=H, tile_w=16, tile_h=8,
                              chunk=128, span_x=5, span_y=5)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))

    dc = np.asarray(render_depth_complexity(scene, vp, cp, ab, settings))
    assert dc.max() > 80, dc.max()  # the scene must actually be deep

    opacity = 0.06
    oracle = np.asarray(render_tubes_raytraced(
        scene, vp, cp, ab, settings,
        max_depth_complexity=int(dc.max()) + 8, opacity=opacity,
    ))

    def fidelity(K):
        img = np.asarray(render_tubes_mlab(
            scene, vp, cp, ab, settings, K=K, opacity=opacity
        ))
        s = min(ssim(oracle[c], img[c]) for c in range(3))
        mad = float(np.abs(oracle[:3] - img[:3]).mean())
        return s, mad

    s8, mad8 = fidelity(8)
    s32, mad32 = fidelity(32)
    assert s32 >= 0.99, (s32, s8)
    assert mad32 < mad8, (mad32, mad8)
