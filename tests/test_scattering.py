"""Scattering tracer + line density field + scattering renderers.

Test discipline mirrors the reference's statistical estimator tests
(`test/TestVolumetricPathTracing.cpp:44-115`): stochastic quantities are
compared as *means across seeds* with small tolerances, deterministic
passes against brute-force references.
"""

import numpy as np
import jax
import jax.numpy as jnp

from linevis_tpu.scene.line_data_scattering import (
    LineDataScattering,
    build_line_density_field,
)
from linevis_tpu.trace.scattering import (
    ScatteringTracingSettings,
    dt_path_trace_rays,
    grid_box,
    trace_scattering_rays,
)


def _cloud(res=16, density=0.7):
    g = np.zeros((res, res, res), np.float32)
    q = res // 4
    g[q:-q, q:-q, q:-q] = density
    return g


def test_grid_box_matches_reference():
    b_min, b_max = grid_box((16, 32, 8))  # (Z, Y, X)
    # maxDim = 32 -> max = (8, 32, 16)/32 * 0.25
    np.testing.assert_allclose(b_max, [0.0625, 0.25, 0.125])
    np.testing.assert_allclose(b_min, -b_max)


def test_empty_volume_rays_pass_through():
    """Zero density: every ray exits straight with 3 recorded points
    (camera, entry, exit) and an unchanged direction."""
    g = np.zeros((8, 8, 8), np.float32)
    n = 16
    dirs = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    orig = np.tile(np.array([[-1.0, 0.0, 0.0]], np.float32), (n, 1))
    # Negligible extinction -> the free-flight distance (DtPathTrace.cpp:
    # 426-429: 1e7 for density <= 1e-5) immediately exceeds d: one exit
    # event. (With a large extinction the majorant forces ~density*extent
    # null-collision steps even through empty space, as in the reference.)
    pos, mask, exit_dirs, exited = dt_path_trace_rays(
        jax.random.PRNGKey(0), jnp.asarray(g), jnp.asarray(orig),
        jnp.asarray(dirs), jnp.full((n,), 1e-6), jnp.ones((n,)), 0.2,
        max_events=16,
    )
    pos, mask = np.asarray(pos), np.asarray(mask)
    assert np.asarray(exited).all()
    np.testing.assert_allclose(np.asarray(exit_dirs), dirs, atol=1e-6)
    assert (mask.sum(1) == 3).all()
    # Entry point on the box boundary x = -0.25.
    np.testing.assert_allclose(pos[:, 1, 0], -0.25, atol=1e-5)


def test_absorbing_volume_kills_paths():
    """albedo=0: any real collision absorbs; no scattering direction
    change ever happens."""
    g = np.ones((8, 8, 8), np.float32)
    n = 64
    dirs = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    orig = np.tile(np.array([[-1.0, 0.0, 0.0]], np.float32), (n, 1))
    pos, mask, exit_dirs, exited = dt_path_trace_rays(
        jax.random.PRNGKey(1), jnp.asarray(g), jnp.asarray(orig),
        jnp.asarray(dirs), jnp.full((n,), 256.0), jnp.zeros((n,)), 0.2,
        max_events=64,
    )
    # Straight paths regardless of termination.
    np.testing.assert_allclose(np.asarray(exit_dirs), dirs, atol=1e-6)
    # Dense absorbing cube, extinction 256 over 0.5 extent: essentially
    # every path is absorbed.
    assert np.asarray(exited).mean() < 0.05


def test_exit_fraction_estimator_across_seeds():
    """Mean exit fraction is seed-independent (estimator-mean equality,
    the reference's TestVolumetricPathTracing discipline)."""
    g = _cloud()
    n = 512
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    orig = np.tile(np.array([[-0.5, -0.5, -0.5]], np.float32), (n, 1))
    look = -orig / np.linalg.norm(orig[0])
    dirs = 0.2 * dirs + look
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    fracs = []
    for seed in (0, 1):
        _, _, _, exited = dt_path_trace_rays(
            jax.random.PRNGKey(seed), jnp.asarray(g), jnp.asarray(orig),
            jnp.asarray(dirs), jnp.full((n,), 300.0),
            jnp.full((n,), 0.9), 0.2, max_events=96,
        )
        fracs.append(np.asarray(exited).mean())
    assert abs(fracs[0] - fracs[1]) < 0.08, fracs


def test_density_field_straight_line():
    """One axis-aligned segment: total splatted mass == segment length
    (before normalization the field integrates the length exactly)."""
    pos = np.zeros((1, 8, 3), np.float32)
    pos[0, :, 0] = np.linspace(-0.2, 0.2, 8)
    mask = np.ones((1, 8), bool)
    b_min = jnp.asarray([-0.25, -0.25, -0.25])
    b_max = jnp.asarray([0.25, 0.25, 0.25])
    f = build_line_density_field(
        jnp.asarray(pos), jnp.asarray(mask), b_min, b_max, (8, 8, 8),
        n_sub=8,
    )
    f = np.asarray(f)
    assert f.max() == 1.0
    # Mass only in the crossed row of voxels (y = z = center).
    nz = np.nonzero(f)
    assert set(nz[0]) == {4} and set(nz[1]) == {4}


def test_scattering_line_data_end_to_end():
    g = _cloud()
    s = ScatteringTracingSettings(
        res_x=3, res_y=3, samples_per_pixel=2, extinction=(512, 512, 512),
        max_events=48, seed=7,
    )
    ld = LineDataScattering.trace(g, s)
    assert ld.num_lines > 0
    assert ld.exit_directions.shape == (18, 3)
    f = ld.get_line_density_field()
    assert f.shape == (16, 16, 16)
    assert 0.0 <= f.min() and f.max() <= 1.0
    assert (f > 0).any()


def test_spherical_heatmap_hotspot():
    """All exit dirs equal -> the heat map peaks at that direction's
    Mollweide pixel and is ~zero on the opposite side."""
    from linevis_tpu.render.spherical_heatmap import render_spherical_heatmap

    dirs = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (32, 1))
    img = np.asarray(render_spherical_heatmap(jnp.asarray(dirs), height=64))
    a = img[..., 3]
    assert a.max() == 1.0
    # +x maps to the ellipse center (lambda=0, phi=0).
    h, w = a.shape
    center = img[h // 2, w // 2, :3]
    assert center[0] > 0.9 and center[2] < 0.1  # red hotspot
    # Left edge inside ellipse: no hits -> blue (cold).
    cold = img[h // 2, w // 8, :3]
    assert cold[2] > 0.9 and cold[0] < 0.1


def test_line_density_map_renderer_runs():
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.renderer import create_renderer

    g = _cloud()
    s = ScatteringTracingSettings(
        res_x=2, res_y=2, samples_per_pixel=2, extinction=(512, 512, 512),
        max_events=32,
    )
    ld = LineDataScattering.trace(g, s)
    r = create_renderer("Line Density Map Renderer")
    r.set_line_data(ld)
    cam = Camera(position=(0.0, 0.0, 1.0), width=32, height=24)
    img = r.render(cam)
    assert img.shape == (24, 32, 4)
    assert np.isfinite(img).all()
    assert img[..., 3].max() > 0.0  # something rendered

    hm = create_renderer("Spherical Heat Map Renderer")
    hm.set_line_data(ld)
    out = hm.render(Camera(position=(0, 0, 1), width=64, height=32))
    assert out.shape == (32, 64, 4)


def test_density_field_ignores_out_of_box_segments():
    """Segments outside the voxel grid contribute nothing (the reference
    DDA only visits in-grid voxels) — clamping them would let long
    camera->entry segments dominate the normalization."""
    pos = np.zeros((1, 8, 3), np.float32)
    # First half far outside the box, second half inside.
    pos[0, :4, 0] = np.linspace(-5.0, -0.3, 4)
    pos[0, 4:, 0] = np.linspace(-0.2, 0.2, 4)
    mask = np.ones((1, 8), bool)
    b_min = jnp.asarray([-0.25, -0.25, -0.25])
    b_max = jnp.asarray([0.25, 0.25, 0.25])
    f = np.asarray(build_line_density_field(
        jnp.asarray(pos), jnp.asarray(mask), b_min, b_max, (8, 8, 8),
        n_sub=8,
    ))
    # Border voxel (x=0) must NOT dominate: the outside run is ~16x longer
    # than any in-box segment, so with clamping it would be the max.
    assert f.max() == 1.0
    inside_row = f[4, 4, :]
    assert inside_row.argmax() > 0 or inside_row[0] <= 1.0
    # The x=0 border voxel carries no more than the in-box segment scale.
    assert f[4, 4, 0] <= 1.0 and f[4, 4, 0] < 0.999 or f[4, 4, 1:].max() == 1.0
