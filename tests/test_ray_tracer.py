"""Iterative re-cast transparent ray tracer (reference
`TubeRayTracing.glsl:61-82` / VulkanRayTracer analytic LSS mode)."""

import pytest
import numpy as np
import jax.numpy as jnp

from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.ray_tracer import (
    build_capsule_bvh,
    render_tubes_raytraced,
)
from linevis_tpu.render.tube_raster import _proj_constants, build_capsule_scene

W, H = 64, 48


def _scene(radius=0.03, seed=12):
    rng = np.random.default_rng(seed)
    L, P = 5, 8
    pos = np.cumsum(rng.normal(0, 0.07, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    mask = np.ones((L, P), bool)
    attrs = rng.uniform(0, 1, (L, P)).astype(np.float32)
    return build_capsule_scene(pos, mask, attrs, radius=radius)


def _args(scene):
    cam = Camera(position=(0.0, 0.1, 1.2), look_at_point=(0, 0, 0),
                 width=W, height=H)
    settings = RasterSettings(width=W, height=H, tile_w=16, tile_h=8,
                              chunk=32, span_x=3, span_y=3)
    return (
        jnp.asarray(cam.view_projection_matrix()),
        jnp.asarray(np.asarray(cam.position, np.float32)),
        jnp.asarray(_proj_constants(cam)),
        settings,
    )


def test_raytraced_matches_mlab_exact_blend():
    """Depth complexity <= K: the re-cast loop and the MLAB K-buffer are
    both exact front-to-back blends of the same analytic surfaces with
    the same shading -> images agree (the reference's cross-renderer
    consistency argument, VulkanRayTracer vs rasterizers).  The ray
    tracer composites entry AND exit surfaces (the reference re-cast
    loop has no backface culling, TubeRayTracing.glsl:61-82), so the
    MLAB side runs two_sided=True here."""
    from linevis_tpu.render.oit import render_tubes_mlab

    scene = _scene()
    vp, cp, ab, settings = _args(scene)
    rt = np.asarray(render_tubes_raytraced(
        scene, vp, cp, ab, settings, max_depth_complexity=24, opacity=0.4
    ))
    ml = np.asarray(render_tubes_mlab(scene, vp, cp, ab, settings, K=16,
                                      opacity=0.4, two_sided=True))
    diff = np.abs(rt - ml)
    assert diff.mean() < 2e-3, diff.mean()
    assert (diff > 0.05).mean() < 0.01, (diff > 0.05).mean()


def test_raytraced_transmittance_saturates():
    """Opaque-ish tubes: alpha ~1 -> first hit dominates, background only
    where no geometry."""
    scene = _scene(radius=0.05)
    vp, cp, ab, settings = _args(scene)
    img = np.asarray(render_tubes_raytraced(
        scene, vp, cp, ab, settings, max_depth_complexity=4, opacity=1.0
    ))
    assert np.isfinite(img).all()
    a = img[3]
    assert ((a > 0.99) | (a < 0.01)).mean() > 0.95


@pytest.mark.slow
def test_mlat_matches_recast_on_disjoint_segments():
    """MLAT K-node payload (MlatInsert.glsl role) == the exact re-cast
    loop when depth complexity <= K and no coincident joint surfaces
    exist (disjoint single-segment lines)."""
    from linevis_tpu.render.ray_tracer import render_tubes_mlat

    L = 6
    pos = np.zeros((L, 2, 3), np.float32)
    for i in range(L):
        pos[i, 0] = (-0.3, -0.2 + 0.08 * i, -0.1 + 0.03 * i)
        pos[i, 1] = (0.3, -0.2 + 0.08 * i, 0.1 - 0.03 * i)
    scene = build_capsule_scene(
        pos, np.ones((L, 2), bool),
        np.linspace(0, 1, 2 * L, dtype=np.float32).reshape(L, 2),
        radius=0.04,
    )
    vp, cp, ab, settings = _args(scene)
    rt = np.asarray(render_tubes_raytraced(
        scene, vp, cp, ab, settings, max_depth_complexity=16, opacity=0.5
    ))
    ml = np.asarray(render_tubes_mlat(
        scene, vp, cp, ab, settings, K=8, opacity=0.5
    ))
    assert np.isfinite(ml).all()
    diff = np.abs(rt - ml)
    assert diff.mean() < 1e-4, diff.mean()
    assert diff.max() < 1e-2, diff.max()


@pytest.mark.slow
def test_registry_vulkan_ray_tracer_mode():
    """'Vulkan Ray Tracer' resolves to the exact re-cast tracer with
    jittered accumulation + move reset (VulkanRayTracer.hpp:135-143)."""
    import dataclasses

    from linevis_tpu.core.trajectories import Trajectories
    from linevis_tpu.render.renderer import create_renderer
    from linevis_tpu.scene.line_data import LineData

    rng = np.random.default_rng(7)
    L, P = 3, 4
    pos = np.cumsum(rng.normal(0, 0.08, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    traj = Trajectories(
        positions=pos,
        attributes=rng.uniform(0, 1, (L, 1, P)).astype(np.float32),
        mask=np.ones((L, P), bool),
        num_points=np.full((L,), P, np.int32),
        attribute_names=["a"],
    )
    ld = LineData(traj)
    ld.set_line_width(0.06)
    r = create_renderer("Vulkan Ray Tracer")
    assert type(r).__name__ == "VulkanRayTracerRenderer"
    r.set_line_data(ld)
    cam = Camera(position=(0.0, 0.1, 1.2), width=32, height=16)
    a = r.render(cam)
    assert r._frame == 1
    b = r.render(cam)  # jittered accumulation frame
    assert r._frame == 2
    assert np.isfinite(b).all()
    cam2 = dataclasses.replace(cam, position=(0.1, 0.1, 1.2))
    r.render(cam2)
    assert r._frame == 1  # reset on move

    # MLAT variant reachable through settings.
    from linevis_tpu.core.settings import SettingsMap

    rm = create_renderer(
        "Vulkan Ray Tracer",
        SettingsMap({"use_mlat": True, "num_nodes": 4}),
    )
    rm.set_line_data(ld)
    m = rm.render(cam)
    assert np.isfinite(m).all()
    assert m.shape == a.shape


def test_bvh_reuse_is_identical():
    scene = _scene()
    vp, cp, ab, settings = _args(scene)
    bvh = build_capsule_bvh(scene)
    a = np.asarray(render_tubes_raytraced(
        scene, vp, cp, ab, settings, max_depth_complexity=8, opacity=0.4,
        bvh=bvh,
    ))
    b = np.asarray(render_tubes_raytraced(
        scene, vp, cp, ab, settings, max_depth_complexity=8, opacity=0.4,
    ))
    np.testing.assert_array_equal(a, b)
