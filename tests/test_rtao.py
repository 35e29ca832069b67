"""RTAO: grid occlusion tracing vs brute-force ray-capsule tests."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from linevis_tpu.kernels.ao_grid import build_segment_grid, trace_ao_occlusion
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.rtao import RtaoSettings, render_tubes_rtao_image
from linevis_tpu.render.tube_raster import build_capsule_scene

from tests.test_capsule_raster import _ray_capsule_np


def _random_scene(rng, L=12, P=6, radius=0.03):
    pos = np.cumsum(rng.normal(0, 0.08, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    mask = np.ones((L, P), bool)
    attrs = rng.uniform(0, 1, (L, P)).astype(np.float32)
    return build_capsule_scene(pos, mask, attrs, radius=radius)


def test_grid_occlusion_matches_bruteforce(rng):
    scene = _random_scene(rng)
    grid = build_segment_grid(
        scene.a, scene.ba, scene.radius, scene.mask, resolution=16
    )
    n_rays = 128
    o = rng.normal(0, 0.3, (3, n_rays)).astype(np.float32)
    d = rng.normal(0, 1, (3, n_rays)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    t_max = np.full((n_rays,), 0.25, np.float32)
    valid = np.ones((n_rays,), bool)
    occ = np.asarray(
        trace_ao_occlusion(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
            jnp.asarray(valid), grid, interpret=True,
        )
    )
    a_np = np.asarray(scene.a).T
    ba_np = np.asarray(scene.ba).T
    wrong = 0
    for i in range(n_rays):
        ts = [
            _ray_capsule_np(o[:, i], d[:, i], a_np[s], a_np[s] + ba_np[s],
                            scene.radius)
            for s in range(scene.num_segments)
        ]
        tmin = min(ts)
        expected = 1.0 if (1e-4 < tmin < 0.25) else 0.0
        if expected != occ[i]:
            # Cell sampling can miss grazing crossings; tolerate near-t_max
            # and grazing cases only.
            wrong += 1
    assert wrong <= 3, f"{wrong}/{n_rays} rays disagree"


@pytest.mark.slow
def test_rtao_darkens_concave(rng):
    """A plane of parallel lines: AO near neighbors < AO of an isolated line."""
    L = 9
    pos = np.zeros((L + 1, 2, 3), np.float32)
    for i in range(L):
        pos[i, 0] = (-0.4, 0.0, -0.2 + 0.05 * i)
        pos[i, 1] = (0.4, 0.0, -0.2 + 0.05 * i)
    pos[L, 0] = (-0.4, 0.45, 0.0)  # isolated line above
    pos[L, 1] = (0.4, 0.45, 0.0)
    mask = np.ones((L + 1, 2), bool)
    attrs = np.full((L + 1, 2), 0.5, np.float32)
    scene = build_capsule_scene(pos, mask, attrs, radius=0.02)

    cam = Camera(position=(0.0, 0.6, 1.2), look_at_point=(0, 0, 0),
                 width=64, height=48)
    S = RasterSettings(width=64, height=48, tile_w=16, tile_h=8, chunk=16,
                       span_x=4, span_y=4)
    img = render_tubes_rtao_image(
        scene, cam, settings=S,
        rtao=RtaoSettings(num_samples=8, ao_radius=0.15, grid_resolution=16),
    )
    assert np.isfinite(img).all()
    # Compare mean luminance of covered pixels in the dense region (lower
    # half of image) vs the isolated line (should be brighter).
    lum = img[..., :3].mean(-1)
    cov = (img[..., :3] < 0.999).any(-1)
    dense = lum[28:][cov[28:]]
    iso = lum[:20][cov[:20]]
    assert len(dense) > 0 and len(iso) > 0
    assert iso.mean() > dense.mean()


def test_ray_batching_matches_single_shot(rng):
    """rays_per_batch streams the pair expansion through lax.map in
    fixed-size batches (the 1080p memory fix); the traced occlusion must
    be bit-identical to the single-shot path."""
    import dataclasses

    from linevis_tpu.render.rtao import render_tubes_rtao
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = _random_scene(rng)
    cam = Camera(position=(0.0, 0.2, 1.2), look_at_point=(0, 0, 0),
                 width=64, height=32)
    S = RasterSettings(width=64, height=32, tile_w=16, tile_h=8, chunk=16,
                       span_x=4, span_y=4)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    base = RtaoSettings(num_samples=2, ao_radius=0.2, grid_resolution=16,
                        rays_per_batch=0)
    one = np.asarray(render_tubes_rtao(scene, vp, cp, ab, S, base))
    # 2 spp * 64 * 32 = 4096 rays -> 4 batches of 1024+pad.
    batched = np.asarray(render_tubes_rtao(
        scene, vp, cp, ab, S,
        dataclasses.replace(base, rays_per_batch=1024),
    ))
    np.testing.assert_array_equal(one, batched)


def test_registry_rtao_accumulates_and_resets():
    """Registry 'Vulkan Ray Tracer' accumulates frames for a static camera
    and resets on camera moves (VulkanRayTracer.hpp:135-143 semantics)."""
    import dataclasses

    from linevis_tpu.core.trajectories import Trajectories
    from linevis_tpu.render.renderer import create_renderer
    from linevis_tpu.scene.line_data import LineData

    rng = np.random.default_rng(4)
    L, P = 4, 4
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
    r.set_line_data(ld)
    cam = Camera(position=(0.0, 0.1, 1.2), width=32, height=16)
    a = r.render(cam)
    assert r._frame == 1
    b = r.render(cam)
    assert r._frame == 2
    assert np.isfinite(b).all()
    cam2 = dataclasses.replace(cam, position=(0.1, 0.1, 1.2))
    r.render(cam2)
    assert r._frame == 1  # reset on move


@pytest.mark.slow
def test_rtao_denoiser_variants():
    """AO denoiser chain (reference RTAO optional denoiser): both
    variants produce finite images; the spatially-hashed AO at 1 spp is
    closer to a high-spp reference than the raw 1-spp render."""
    import jax.numpy as jnp

    from linevis_tpu.render.rtao import RtaoSettings, render_tubes_rtao
    from linevis_tpu.render.tube_raster import _proj_constants

    L = 9
    pos = np.zeros((L, 2, 3), np.float32)
    for i in range(L):
        pos[i, 0] = (-0.4, 0.0, -0.2 + 0.05 * i)
        pos[i, 1] = (0.4, 0.0, -0.2 + 0.05 * i)
    mask = np.ones((L, 2), bool)
    attrs = np.full((L, 2), 0.5, np.float32)
    scene = build_capsule_scene(pos, mask, attrs, radius=0.02)
    cam = Camera(position=(0.0, 0.6, 1.2), look_at_point=(0, 0, 0),
                 width=64, height=48)
    settings = RasterSettings(width=64, height=48, tile_w=16, tile_h=8,
                              chunk=16, span_x=4, span_y=4)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))

    ref = np.asarray(render_tubes_rtao(
        scene, vp, cp, ab, settings,
        RtaoSettings(num_samples=32, seed=9, grid_resolution=16),
        frame=0,
    ))
    raw = np.asarray(render_tubes_rtao(
        scene, vp, cp, ab, settings,
        RtaoSettings(num_samples=1, seed=3, grid_resolution=16),
        frame=0,
    ))
    outs = {}
    for name in ("Spatial Hashing", "EAW"):
        img = np.asarray(render_tubes_rtao(
            scene, vp, cp, ab, settings,
            RtaoSettings(num_samples=1, seed=3, grid_resolution=16,
                         denoiser=name), frame=0,
        ))
        assert np.isfinite(img).all()
        outs[name] = img
    mse_raw = float(((raw - ref) ** 2).mean())
    mse_sh = float(((outs["Spatial Hashing"] - ref) ** 2).mean())
    assert mse_sh < mse_raw, (mse_sh, mse_raw)
