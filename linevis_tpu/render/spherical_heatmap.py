"""Spherical heat map of scattering exit directions (Mollweide projection).

Port of `src/Renderers/Scattering/SphericalHeatMapRenderer.{hpp:44-52,cpp}`
and `create_spherical_heatmap_image` (`DtPathTrace.cpp:84-183`): every
pixel of a 2:1 Mollweide ellipse is un-projected to a point on the unit
sphere; the density of exit directions around that point is estimated with
a Gaussian RBF (search radius 0.1, epsilon 3.0) and tone-mapped blue ->
green -> red.

The reference queries a kd-tree per pixel; here the pixel x direction
distance matrix is a single batched computation (pixels x directions fits
comfortably for the typical ray counts), vectorized on the VPU/MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["render_spherical_heatmap", "SphericalHeatMapRenderer"]

_SEARCH_RADIUS = 0.1  # DtPathTrace.cpp:85
_RBF_EPSILON = 3.0  # DtPathTrace.cpp:86


@partial(jax.jit, static_argnames=("height",))
def render_spherical_heatmap(
    exit_dirs: jnp.ndarray,  # [N, 3] unit vectors
    height: int = 128,
) -> jnp.ndarray:
    """-> [H, 2H, 4] RGBA heat map (outside the ellipse: transparent)."""
    width = height * 2
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    u = -1.0 + (xs / (width - 1)) * 2.0  # [-1, 1]
    v = -0.5 + (ys / (height - 1))  # [-0.5, 0.5]
    uu, vv = jnp.meshgrid(u, v)
    inside = uu * uu + 4.0 * vv * vv <= 1.0

    # Inverse Mollweide (DtPathTrace.cpp:110-127).
    two_sqrt_two = 2.0 * jnp.sqrt(2.0)
    x_in = two_sqrt_two * uu
    y_in = two_sqrt_two * vv
    z = jnp.sqrt(jnp.clip(1.0 - (x_in / 4.0) ** 2 - (y_in / 2.0) ** 2, 0.0, 1.0))
    lam = 2.0 * jnp.arctan2(z * x_in, 2.0 * (2.0 * z * z - 1.0))
    phi = jnp.arcsin(jnp.clip(z * y_in, -1.0, 1.0))
    # point = rotY(lambda) * rotZ(phi) * (1, 0, 0)
    px = jnp.cos(lam) * jnp.cos(phi)
    py = jnp.sin(phi)
    pz = -jnp.sin(lam) * jnp.cos(phi)
    pts = jnp.stack([px, py, pz], axis=-1).reshape(-1, 3)  # [HW, 3]

    # RBF density: sum over dirs of exp(-(eps * dist / R)^2) for dist <= R.
    d2 = jnp.sum(
        (pts[:, None, :] - exit_dirs[None, :, :]) ** 2, axis=-1
    )  # [HW, N]
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    rbf = jnp.where(
        dist <= _SEARCH_RADIUS,
        jnp.exp(-((_RBF_EPSILON * dist / _SEARCH_RADIUS) ** 2)),
        0.0,
    )
    val = jnp.sum(rbf, axis=1).reshape(height, width)
    vmax = jnp.maximum(jnp.max(jnp.where(inside, val, 0.0)), 1e-12)

    # Poor man's transfer function (DtPathTrace.cpp:166-173).
    t = val / vmax
    lo = jnp.clip(2.0 * t, 0.0, 1.0)
    hi = jnp.clip(2.0 * t - 1.0, 0.0, 1.0)
    r = hi
    g = jnp.where(t < 0.5, lo, 1.0 - hi)
    b = jnp.where(t < 0.5, 1.0 - lo, 0.0)
    a = jnp.where(inside, 1.0, 0.0)
    rgb = jnp.stack([r, g, b], axis=-1) * a[..., None]
    return jnp.concatenate([rgb, a[..., None]], axis=-1)


class SphericalHeatMapRenderer:
    """Registry-compatible renderer (RENDERING_MODE_SPHERICAL_HEAT_MAP)."""

    name = "Spherical Heat Map Renderer"

    def __init__(self, settings=None):
        self.line_data = None

    def set_line_data(self, line_data) -> None:
        self.line_data = line_data

    def set_transfer_function(self, tf) -> None:
        pass

    def set_new_settings(self, settings) -> None:
        pass

    def render(self, camera) -> np.ndarray:
        dirs = self.line_data.exit_directions
        if dirs is None or len(dirs) == 0:
            return np.zeros((camera.height, camera.height * 2, 4), np.float32)
        img = render_spherical_heatmap(
            jnp.asarray(dirs, jnp.float32), height=camera.height
        )
        return np.asarray(img)
