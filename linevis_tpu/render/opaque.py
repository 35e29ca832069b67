"""Opaque tube renderer (G-buffer raster + elementwise shading).

Reference: `src/Renderers/OpaqueLineRenderer.{hpp:40,cpp}` (MSAA raster of
tube triangles). TPU-native: one Pallas CSR tile pass produces depth +
interpolated G-buffer planes (`kernels/raster_pallas.py`), then shading is
pure elementwise math (`render/pipeline.py:shade_gbuffer`); anti-aliasing
via ordered supersampling (render at kx resolution, box-downsample),
replacing MSAA.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.geometry.tubes import TubeMesh
from linevis_tpu.kernels.raster_pallas import (
    build_csr_binning,
    rasterize_gbuffer_pallas,
)
from linevis_tpu.kernels.tiles import unpack_tiles
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import (
    GBUFFER_PLANES,
    RasterSettings,
    build_payload,
    shade_gbuffer,
    tube_vertex_stage,
)
from linevis_tpu.render.transfer_function import TransferFunction

__all__ = ["render_opaque", "render_opaque_image", "rasterize_gbuffer"]

_GBUF_KEYS = ["inv_w", "attr_w", "nx", "ny", "nz", "tx", "ty", "tz"]


def rasterize_gbuffer(mesh: TubeMesh, view_proj, settings: RasterSettings):
    """Mesh -> (gbuf dict of [H, W] images, depth, batch, overflow)."""
    batch = tube_vertex_stage(mesh, view_proj, settings.width, settings.height)
    payload = build_payload(batch)  # [40, T]
    csr = build_csr_binning(
        batch.tri_x,
        batch.tri_y,
        payload,
        batch.tri_valid,
        settings.width,
        settings.height,
        settings.tile_w,
        settings.tile_h,
        settings.chunk,
        settings.span_x,
        settings.span_y,
        settings.pairs_capacity,
    )
    interpret = jax.default_backend() == "cpu"
    depth_t, id_t, attrs_t = rasterize_gbuffer_pallas(
        csr, GBUFFER_PLANES, settings.tile_w, settings.tile_h,
        interpret=interpret,
    )

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
            settings.width, settings.height,
        )

    gbuf = {"id": unp(id_t)}
    for key, buf in zip(_GBUF_KEYS, attrs_t):
        gbuf[key] = unp(buf)
    return gbuf, unp(depth_t), batch, csr.overflow


@partial(jax.jit, static_argnames=("settings",))
def render_opaque(
    mesh: TubeMesh,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    tf_table: jnp.ndarray,
    settings: RasterSettings,
    ray_basis: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Render the tube mesh -> [4, H, W] linear RGBA image (channels-first)."""
    gbuf, _depth, batch, _overflow = rasterize_gbuffer(mesh, view_proj, settings)
    if ray_basis is None:
        ray_basis = _ray_basis_from_view_proj(view_proj)
    return shade_gbuffer(
        gbuf,
        tf_table,
        camera_position,
        ray_basis,
        batch.view_z_min,
        batch.view_z_max,
        settings,
    )


def _ray_basis_from_view_proj(view_proj: jnp.ndarray) -> jnp.ndarray:
    """Recover the scaled camera ray basis from the view-projection matrix.

    Columns: right * tan(fovx/2), up * tan(fovy/2), forward — such that a
    pixel with NDC (u, v) has ray direction basis @ [u, v, 1] with unit
    view-depth (distance along forward).
    """
    # view_proj = P @ V. Rows of V: right, up, -forward; P row 3 = (0,0,-1,0),
    # so view_proj[3, :3] = +forward and clip.w = forward . (p - eye) = view
    # depth. The x/y rows are right/up scaled by 1/tan half-angles.
    fwd = view_proj[3, :3]
    r = view_proj[0, :3]
    u = view_proj[1, :3]
    tx = jnp.linalg.norm(r)
    ty = jnp.linalg.norm(u)
    right = r / jnp.maximum(tx, 1e-12)
    up = u / jnp.maximum(ty, 1e-12)
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-12)
    return jnp.stack([right / tx, up / ty, fwd], axis=1)


def render_opaque_image(
    mesh: TubeMesh,
    camera: Camera,
    tf: Optional[TransferFunction] = None,
    settings: Optional[RasterSettings] = None,
    supersample: int = 1,
) -> np.ndarray:
    """Convenience host wrapper -> numpy [H, W, 4] linear RGBA."""
    tf = tf or TransferFunction.standard()
    settings = settings or RasterSettings(width=camera.width, height=camera.height)
    cam = camera
    s = settings
    if supersample > 1:
        s = dataclasses.replace(
            settings,
            width=settings.width * supersample,
            height=settings.height * supersample,
        )
        cam = dataclasses.replace(camera, width=s.width, height=s.height)
    img = render_opaque(
        mesh,
        jnp.asarray(cam.view_projection_matrix()),
        jnp.asarray(np.asarray(camera.position, np.float32)),
        jnp.asarray(tf.table),
        s,
    )
    img = np.moveaxis(np.asarray(img), 0, -1)  # -> [H, W, 4]
    if supersample > 1:
        k = supersample
        H, W = settings.height, settings.width
        img = img.reshape(H, k, W, k, 4).mean(axis=(1, 3))
    return img
