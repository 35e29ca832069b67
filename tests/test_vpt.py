"""Volumetric path tracer: estimator-mean equality tests.

Mirrors the reference's integration test protocol
(`test/TestVolumetricPathTracing.cpp:44-115,123-227`): different unbiased
estimators (delta / spectral delta / ratio tracking) must produce the
same image mean within a small tolerance, across seeds and grid
resolutions; synthetic block volumes are built procedurally
(`createCloudBlock`, TestVolumetricPathTracingTestData.cpp).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linevis_tpu.render.vpt import (
    VptSettings,
    render_vpt,
    sample_skybox,
    vpt_trace_rays,
)

W = H = 48
SPP = 24


def _cloud_block(res=8, density=1.0, boundary=0.0):
    """createCloudBlock role: inner block at `density`, boundary layer."""
    g = np.full((res, res, res), boundary, np.float32)
    q = max(res // 4, 1)
    g[q:-q, q:-q, q:-q] = density
    return g


def _camera():
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.tube_raster import _ray_basis

    cam = Camera(position=(0.0, 0.1, 0.9), look_at_point=(0, 0, 0),
                 width=W, height=H)
    basis = _ray_basis(jnp.asarray(cam.view_projection_matrix()))
    return cam, basis


def _mean_image(mode, seed, grid, extinction=150.0):
    cam, basis = _camera()
    s = VptSettings(
        mode=mode, extinction=(extinction,) * 3,
        scattering_albedo=(0.9, 0.9, 0.9), phase_g=0.2, max_events=192,
    )
    img = render_vpt(
        jax.random.PRNGKey(seed), jnp.asarray(grid),
        jnp.asarray(np.asarray(cam.position, np.float32)), basis,
        W, H, settings=s, spp=SPP,
    )
    img = np.asarray(img)
    assert np.isfinite(img).all()
    return img.mean()


def test_skybox_gradient():
    up = np.asarray(sample_skybox(jnp.asarray([[0.0, 1.0, 0.0]])))[0]
    down = np.asarray(sample_skybox(jnp.asarray([[0.0, -1.0, 0.0]])))[0]
    np.testing.assert_allclose(up, [0.01, 0.1, 0.7], atol=1e-6)
    np.testing.assert_allclose(down, [0.1, 0.05, 0.01], atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("grid_res", [1, 8])
def test_estimators_agree(grid_res):
    """Delta vs spectral-delta vs ratio tracking: equal image means
    (TestVolumetricPathTracing.cpp:123-227 across grid resolutions)."""
    grid = _cloud_block(res=max(grid_res, 2), density=1.0)
    means = {
        mode: _mean_image(mode, seed=0, grid=grid)
        for mode in ("Delta Tracking", "Spectral Delta Tracking",
                     "Ratio Tracking", "Decomposition Tracking")
    }
    vals = list(means.values())
    for i in range(1, len(vals)):
        assert abs(vals[0] - vals[i]) < 0.015, means


@pytest.mark.slow
def test_estimator_seed_stability():
    grid = _cloud_block(res=8, density=0.8, boundary=0.1)
    m0 = _mean_image("Delta Tracking", seed=0, grid=grid)
    m1 = _mean_image("Delta Tracking", seed=1, grid=grid)
    assert abs(m0 - m1) < 0.01, (m0, m1)


def test_empty_volume_is_background():
    """Zero density -> pure skybox+sun image, identical for all modes."""
    grid = np.zeros((4, 4, 4), np.float32)
    cam, basis = _camera()
    imgs = []
    for mode in ("Delta Tracking", "Ratio Tracking"):
        s = VptSettings(mode=mode, extinction=(100.0,) * 3, max_events=32)
        img = np.asarray(render_vpt(
            jax.random.PRNGKey(3), jnp.asarray(grid),
            jnp.asarray(np.asarray(cam.position, np.float32)), basis,
            W, H, settings=s, spp=2,
        ))
        imgs.append(img)
    np.testing.assert_allclose(imgs[0], imgs[1], atol=1e-5)


def test_vpt_renderer_accumulates():
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.renderer import create_renderer
    from linevis_tpu.scene.line_data_scattering import LineDataScattering
    from linevis_tpu.trace.scattering import ScatteringTracingSettings

    grid = _cloud_block(res=8)
    ld = LineDataScattering.trace(
        grid,
        ScatteringTracingSettings(res_x=2, res_y=2, samples_per_pixel=1,
                                  max_events=16),
    )
    r = create_renderer("Volumetric Path Tracer")
    r.set_line_data(ld)
    r.vpt = VptSettings(extinction=(100.0,) * 3, max_events=64,
                        samples_per_frame=1)
    cam = Camera(position=(0, 0.1, 0.9), width=24, height=16)
    a = r.render(cam)
    b = r.render(cam)
    assert a.shape == (16, 24, 4)
    assert np.isfinite(b).all()
    assert r.frame == 2


def test_first_scatter_features():
    """return_features yields the reference's ScatterEvent maps: valid
    pixels' first-scatter positions lie inside the volume AABB
    (VolumetricPathTracingPass firstEvent feature maps)."""
    from linevis_tpu.trace.scattering import grid_box

    grid = _cloud_block(res=8, density=2.0)
    cam, basis = _camera()
    s = VptSettings(extinction=(300.0,) * 3, max_events=96)
    img, (first_x, first_has) = render_vpt(
        jax.random.PRNGKey(7), jnp.asarray(grid),
        jnp.asarray(np.asarray(cam.position, np.float32)), basis,
        W, H, settings=s, spp=1, return_features=True,
    )
    first_x = np.asarray(first_x)
    first_has = np.asarray(first_has)
    assert first_x.shape == (H, W, 3) and first_has.shape == (H, W)
    # A dense cloud in front of the camera: the central pixel must scatter.
    assert first_has[H // 2, W // 2]
    b_min, b_max = grid_box(grid.shape)
    pts = first_x[first_has]
    assert (pts >= np.asarray(b_min) - 1e-4).all()
    assert (pts <= np.asarray(b_max) + 1e-4).all()


@pytest.mark.slow
def test_denoiser_reduces_vpt_error():
    """EAW with first-scatter position features: denoised low-spp VPT is
    closer (MSE) to a high-spp reference than the raw low-spp render —
    the reference denoiser chain's purpose (EAWDenoiser.cpp)."""
    from linevis_tpu.render.denoiser import eaw_denoise

    grid = _cloud_block(res=8, density=1.0)
    cam, basis = _camera()
    s = VptSettings(extinction=(200.0,) * 3,
                    scattering_albedo=(0.95,) * 3, max_events=128)
    pos_cam = jnp.asarray(np.asarray(cam.position, np.float32))

    ref = np.asarray(render_vpt(
        jax.random.PRNGKey(100), jnp.asarray(grid), pos_cam, basis,
        W, H, settings=s, spp=48,
    ))
    low, (first_x, first_has) = render_vpt(
        jax.random.PRNGKey(5), jnp.asarray(grid), pos_cam, basis,
        W, H, settings=s, spp=2, return_features=True,
    )
    pos = jnp.where(jnp.asarray(first_has)[None],
                    jnp.moveaxis(jnp.asarray(first_x), -1, 0), 1e3)
    den = np.moveaxis(np.asarray(
        eaw_denoise(jnp.moveaxis(jnp.asarray(low), -1, 0), position=pos)
    ), 0, -1)
    mse_raw = float(((np.asarray(low) - ref) ** 2).mean())
    mse_den = float(((den - ref) ** 2).mean())
    assert mse_den < mse_raw * 0.7, (mse_raw, mse_den)


def test_vpt_renderer_denoiser_setting():
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.renderer import create_renderer
    from linevis_tpu.scene.line_data_scattering import LineDataScattering
    from linevis_tpu.trace.scattering import ScatteringTracingSettings

    grid = _cloud_block(res=8)
    ld = LineDataScattering.trace(
        grid,
        ScatteringTracingSettings(res_x=2, res_y=2, samples_per_pixel=1,
                                  max_events=16),
    )
    for name in ("EAW", "SVGF"):
        r = create_renderer("Volumetric Path Tracer")
        r.set_line_data(ld)
        r.vpt = VptSettings(extinction=(100.0,) * 3, max_events=64,
                            samples_per_frame=1)
        r.denoiser = name
        out = r.render(Camera(position=(0, 0.1, 0.9), width=24, height=16))
        assert out.shape == (16, 24, 4)
        assert np.isfinite(out).all()


@pytest.mark.slow
def test_residual_ratio_tracking_mode():
    """Residual Ratio Tracking (ResidualRatioTracking.glsl:85-239): the
    reference's reservoir-sampled super-voxel estimator.  Upstream marks
    it work-in-progress (its continuation rule is not weight-normalized,
    so it does NOT share the unbiased modes' mean exactly); the parity
    contract is structural: finite, sky-dominated where the volume is
    thin, and within coarse agreement of delta tracking."""
    grid = _cloud_block(res=8, density=1.0, boundary=0.1)
    m_rr = _mean_image("Residual Ratio Tracking", seed=0, grid=grid)
    m_dt = _mean_image("Delta Tracking", seed=0, grid=grid)
    assert 0.4 * m_dt < m_rr < 1.6 * m_dt, (m_rr, m_dt)


@pytest.mark.slow
def test_interpolation_modes():
    """Nearest / Stochastic / Trilinear (VolumetricPathTracingPass.hpp:
    67-74): stochastic jittered-nearest equals trilinear in expectation;
    nearest differs on a smooth ramp."""
    rng = np.random.default_rng(2)
    grid = (0.2 + 0.8 * rng.uniform(0, 1, (8, 8, 8))).astype(np.float32)
    cam, basis = _camera()
    means = {}
    for interp in ("Trilinear", "Nearest", "Stochastic"):
        s = VptSettings(
            mode="Delta Tracking", extinction=(120.0,) * 3,
            scattering_albedo=(0.9,) * 3, max_events=128,
            interpolation=interp,
        )
        img = np.asarray(render_vpt(
            jax.random.PRNGKey(4), jnp.asarray(grid),
            jnp.asarray(np.asarray(cam.position, np.float32)), basis,
            W, H, settings=s, spp=16,
        ))
        assert np.isfinite(img).all()
        means[interp] = img.mean()
    assert abs(means["Stochastic"] - means["Trilinear"]) < 0.01, means
    assert means["Nearest"] != means["Trilinear"]
