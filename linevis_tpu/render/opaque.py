"""Opaque tube renderer (z-buffer + deferred shading).

Reference: `src/Renderers/OpaqueLineRenderer.{hpp:40,cpp}` (MSAA raster of
tube triangles). TPU-native: Pallas CSR tile z-pass
(`kernels/raster_pallas.py`) + one deferred shading pass; anti-aliasing via
ordered supersampling (render at kx resolution, box-downsample), replacing
MSAA.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.geometry.tubes import TubeMesh
from linevis_tpu.kernels.binning import compute_edge_coefficients
from linevis_tpu.kernels.raster_pallas import (
    build_csr_binning,
    rasterize_depth_pallas,
)
from linevis_tpu.kernels.raster_xla import unpack_tiles
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import (
    RasterSettings,
    deferred_shade,
    vertex_stage,
)
from linevis_tpu.render.transfer_function import TransferFunction

__all__ = [
    "render_opaque",
    "render_opaque_image",
    "rasterize_visibility",
    "build_raster_payload",
]


def build_raster_payload(vs) -> jnp.ndarray:
    """[16, T] payload for the Pallas rasterizer (see raster_pallas docs):
    edge coefs (0-8), depth plane (9-11), id plane (12-14), zmin (15)."""
    coefs = compute_edge_coefficients(vs.tri_x, vs.tri_y, vs.tri_z)
    T = coefs.shape[1]
    zero = jnp.zeros((2, T), jnp.float32)
    ids = jnp.arange(T, dtype=jnp.float32)[None, :]
    zmin = jnp.min(vs.tri_z, axis=0)[None, :]  # front-to-back sort key
    return jnp.concatenate([coefs, zero, ids, zmin], axis=0)


def rasterize_visibility(mesh: TubeMesh, view_proj, settings: RasterSettings):
    """Shared z-pass: mesh -> (vertex-stage out, tri_id image, overflow)."""
    vs = vertex_stage(
        mesh.vertices,
        mesh.triangles,
        mesh.triangle_mask,
        view_proj,
        settings.width,
        settings.height,
    )
    payload_rows = build_raster_payload(vs)  # [16, T]
    csr = build_csr_binning(
        vs.tri_x,
        vs.tri_y,
        payload_rows,
        vs.tri_valid,
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
    depth_t, id_t = rasterize_depth_pallas(
        csr, settings.tile_w, settings.tile_h, interpret=interpret
    )
    tri_id = unpack_tiles(
        id_t, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
        settings.width, settings.height,
    )
    depth = unpack_tiles(
        depth_t, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
        settings.width, settings.height,
    )
    return vs, tri_id, depth, csr.overflow


@partial(jax.jit, static_argnames=("settings",))
def render_opaque(
    mesh: TubeMesh,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    tf_table: jnp.ndarray,
    settings: RasterSettings,
) -> jnp.ndarray:
    """Render the tube mesh -> [4, H, W] linear RGBA image (channels-first)."""
    vs, tri_id, _depth, _overflow = rasterize_visibility(mesh, view_proj, settings)
    # Depth-cue range over visible line geometry (reference
    # ComputeDepthValuesPass/MinMaxDepthReductionPass, src/Renderers/DepthCues.hpp).
    big = jnp.float32(3e38)
    depth_min = jnp.min(jnp.where(mesh.vertex_mask, vs.view_z, big))
    depth_max = jnp.max(jnp.where(mesh.vertex_mask, vs.view_z, -big))
    return deferred_shade(
        tri_id,
        mesh,
        vs,
        tf_table,
        camera_position,
        depth_min,
        depth_max,
        settings,
    )


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
