"""Line Density Map renderer: DVR of the scattering line-density field.

Port of `src/Renderers/Scattering/LineDensityMapRenderer.{hpp:55,cpp}` +
`Data/Shaders/Scattering/LineDensityFieldDvrShader.glsl`: per pixel, a ray
is intersected with the field's AABB and marched with step size
voxel_size/10; each step samples the 3D texture, maps density through the
transfer function, converts opacity by Beer-Lambert with the attenuation
coefficient (default 200, LineDensityMapRenderer.hpp:113) and blends
front-to-back.  Here the march is a `lax.scan` over a fixed step count,
vectorized over all pixels at once.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.render.camera import Camera
from linevis_tpu.render.transfer_function import TransferFunction, tf_eval_points

__all__ = ["render_line_density_map", "LineDensityMapRenderer"]


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "n_steps", "tf_color", "tf_opacity",
    ),
)
def render_line_density_map(
    field: jnp.ndarray,  # [Z, Y, X] in [0, 1]
    b_min: jnp.ndarray,  # [3]
    b_max: jnp.ndarray,
    ray_origin: jnp.ndarray,  # [3]
    ray_basis: jnp.ndarray,  # [3, 3] columns right/up/fwd (tube_raster)
    width: int,
    height: int,
    attenuation: float = 200.0,
    n_steps: int = 256,
    tf_color: tuple = (),
    tf_opacity: tuple = ((0.0, 0.0), (1.0, 1.0)),
    background=(1.0, 1.0, 1.0, 0.0),
) -> jnp.ndarray:
    """-> [H, W, 4] linear RGBA."""
    from linevis_tpu.trace.fields import sample_grid_trilinear

    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) * (2.0 / width) - 1.0
    v = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) * (2.0 / height)
    uu, vv = jnp.meshgrid(u, v)
    d = (
        ray_basis[:, 0][:, None, None] * uu[None]
        + ray_basis[:, 1][:, None, None] * vv[None]
        + ray_basis[:, 2][:, None, None]
    )
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    d = d.reshape(3, -1).T  # [N, 3]
    o = ray_origin[None, :]

    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t0 = (b_min[None] - o) * inv
    t1 = (b_max[None] - o) * inv
    t_near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=1), 0.0)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=1)
    hit = t_far > t_near

    nz, ny, nx = field.shape
    voxel_size = jnp.min((b_max - b_min) / jnp.asarray([nx, ny, nz], jnp.float32))
    step = voxel_size / 10.0
    extent = b_max - b_min
    gridf = field.astype(jnp.float32)[..., None]

    def body(carry, i):
        acc_rgb, acc_a = carry
        t = t_near + (i.astype(jnp.float32) + 0.5) * step
        inside = hit & (t < t_far)
        p = o + t[:, None] * d
        tex = (p - b_min[None]) / extent[None]
        dens = sample_grid_trilinear(gridf, tex)[..., 0]
        rgb, a_tf = tf_eval_points(tf_color, tf_opacity, dens)
        alpha = 1.0 - jnp.exp(-a_tf * step * attenuation)
        alpha = jnp.where(inside, alpha, 0.0)
        w = (1.0 - acc_a) * alpha
        acc_rgb = acc_rgb + w[None] * rgb
        acc_a = acc_a + w
        return (acc_rgb, acc_a), None

    n_pix = d.shape[0]
    init = (jnp.zeros((3, n_pix), jnp.float32), jnp.zeros((n_pix,), jnp.float32))
    (acc_rgb, acc_a), _ = jax.lax.scan(body, init, jnp.arange(n_steps))

    bg = jnp.asarray(background, jnp.float32)
    out_rgb = acc_rgb + (1.0 - acc_a)[None] * bg[:3, None]
    out = jnp.concatenate([out_rgb, acc_a[None]], axis=0)
    return out.reshape(4, height, width).transpose(1, 2, 0)


class LineDensityMapRenderer:
    """Registry-compatible renderer (RENDERING_MODE_LINE_DENSITY_MAP)."""

    name = "Line Density Map Renderer"

    def __init__(self, settings=None):
        self.line_data = None
        self.transfer_function = TransferFunction.standard()
        self.attenuation = 200.0
        self.opacity = 0.3
        if settings is not None and settings.has_key("attenuation"):
            self.attenuation = settings.get_float("attenuation")

    def set_line_data(self, line_data) -> None:
        self.line_data = line_data

    def set_transfer_function(self, tf) -> None:
        self.transfer_function = tf

    def set_new_settings(self, settings) -> None:
        if settings.has_key("attenuation"):
            self.attenuation = settings.get_float("attenuation")

    def render(self, camera: Camera) -> np.ndarray:
        from linevis_tpu.render.tube_raster import _ray_basis

        ld = self.line_data
        field = jnp.asarray(ld.get_line_density_field())
        c_pts, o_pts = self.transfer_function.as_static_points()
        if all(abs(p[1] - 1.0) < 1e-6 for p in o_pts):
            # Constant-opacity line TFs make DVR a solid box; default to a
            # steep density->opacity ramp (zero transparent, saturating by
            # 5% of the normalized max — line-density fields are sparse).
            o_pts = ((0.0, 0.0), (0.05, 1.0), (1.0, 1.0))
        basis = _ray_basis(jnp.asarray(camera.view_projection_matrix()))
        img = render_line_density_map(
            field,
            jnp.asarray(ld.grid_b_min), jnp.asarray(ld.grid_b_max),
            jnp.asarray(np.asarray(camera.position, np.float32)),
            basis, camera.width, camera.height,
            attenuation=self.attenuation,
            tf_color=c_pts, tf_opacity=o_pts,
        )
        return np.asarray(img)
