"""Super-voxel grid + residual ratio tracking estimator
(reference `src/Renderers/Scattering/PathTracer/SuperVoxelGrid.cpp:410`,
`Data/Shaders/Scattering/Clouds/ResidualRatioTracking.glsl`)."""

import numpy as np
import jax
import jax.numpy as jnp

from linevis_tpu.render.super_voxel import (
    build_super_voxel_grid,
    residual_ratio_transmittance,
)
from linevis_tpu.trace.fields import sample_grid_trilinear
from linevis_tpu.trace.scattering import grid_box


def _center_ray():
    o = np.array([[-1.0, 0.01, 0.02]], np.float32)
    w = np.array([[1.0, 0.0, 0.0]], np.float32)
    return o, w


def _numeric_transmittance(g, o, w, extinction, n=4000):
    b_min, b_max = grid_box(g.shape)
    t0 = (b_min[0] - o[0, 0]) / w[0, 0]
    t1 = (b_max[0] - o[0, 0]) / w[0, 0]
    ts = np.linspace(t0, t1, n)
    pts = o[0][None] + w[0][None] * ts[:, None]
    tp = (pts - b_min) / (b_max - b_min)
    dens = np.asarray(
        sample_grid_trilinear(jnp.asarray(g)[..., None], jnp.asarray(tp))[
            ..., 0
        ]
    )
    return float(np.exp(-np.trapezoid(extinction * dens, ts)))


def test_super_voxel_majorant_bounds_density():
    """mu_c +- mu_r_bar must bracket every voxel (incl. a 1-voxel halo)
    of its super voxel — the residual majorant contract."""
    rng = np.random.default_rng(1)
    g = rng.uniform(0, 1, (12, 10, 9)).astype(np.float32)
    ext = 10.0
    size = 4
    sv = build_super_voxel_grid(g, ext, size=size)
    mu_c = np.asarray(sv.mu_c)
    mu_r = np.asarray(sv.mu_r_bar)
    for bz in range(mu_c.shape[0]):
        for by in range(mu_c.shape[1]):
            for bx in range(mu_c.shape[2]):
                z0, y0, x0 = bz * size, by * size, bx * size
                blk = g[max(z0 - 1, 0):z0 + size + 1,
                        max(y0 - 1, 0):y0 + size + 1,
                        max(x0 - 1, 0):x0 + size + 1] * ext
                dev = np.abs(blk - mu_c[bz, by, bx]).max()
                assert dev <= mu_r[bz, by, bx] + 1e-4


def test_residual_ratio_transmittance_unbiased():
    """E[T_est] equals the exact transmittance through a heterogeneous
    volume (Novák et al. 2014; glsl residualRatioTrackingEstimator)."""
    rng = np.random.default_rng(0)
    g = (0.3 + 0.7 * rng.uniform(0, 1, (16, 16, 16))).astype(np.float32)
    ext = 12.0
    sv = build_super_voxel_grid(g, ext, size=4)
    o, w = _center_ray()
    N = 3072
    T = np.asarray(
        residual_ratio_transmittance(
            jax.random.PRNGKey(1), jnp.asarray(g), sv,
            jnp.asarray(np.repeat(o, N, 0)), jnp.asarray(np.repeat(w, N, 0)),
            ext,
        )
    )
    ref = _numeric_transmittance(g, o, w, ext)
    assert np.isfinite(T).all()
    se = T.std() / np.sqrt(N)
    assert abs(T.mean() - ref) < max(4 * se, 0.02 * ref + 1e-4), (
        T.mean(), ref, se,
    )


def test_residual_ratio_homogeneous_is_exact():
    """Homogeneous volume: the residual vanishes, the control is exact
    analytic transmittance — zero variance (the method's design point)."""
    g = np.full((8, 8, 8), 0.6, np.float32)
    ext = 5.0
    sv = build_super_voxel_grid(g, ext, size=4)
    o, w = _center_ray()
    N = 64
    T = np.asarray(
        residual_ratio_transmittance(
            jax.random.PRNGKey(3), jnp.asarray(g), sv,
            jnp.asarray(np.repeat(o, N, 0)), jnp.asarray(np.repeat(w, N, 0)),
            ext,
        )
    )
    ref = _numeric_transmittance(g, o, w, ext)
    np.testing.assert_allclose(T, ref, rtol=5e-3)
    assert T.std() < 1e-3 * T.mean() + 1e-6


def test_transmittance_miss_is_one():
    g = np.full((8, 8, 8), 0.6, np.float32)
    sv = build_super_voxel_grid(g, 5.0, size=4)
    o = np.array([[0.0, 5.0, 0.0]], np.float32)
    w = np.array([[1.0, 0.0, 0.0]], np.float32)
    T = np.asarray(
        residual_ratio_transmittance(
            jax.random.PRNGKey(5), jnp.asarray(g), sv,
            jnp.asarray(o), jnp.asarray(w), 5.0,
        )
    )
    np.testing.assert_allclose(T, 1.0)
