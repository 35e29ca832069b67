"""Triangle surface rendering through the tile-binned G-buffer pipeline.

The tube raster's vertex stage derives triangle corners from the tube
grid topology (render/pipeline.py `tube_vertex_stage`); arbitrary indexed
meshes (`TriangleMeshData.hpp:39` datasets, simulation hulls) instead
gather their corner data through the index buffer here, then share the
exact same payload -> binning -> Pallas G-buffer -> shading pipeline.
Shading uses the reference's general surface Blinn-Phong
(Lighting.glsl:66-72) rather than the tube halo model.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.kernels.raster_pallas import build_csr_binning
from linevis_tpu.kernels.tiles import unpack_tiles
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.lighting import (
    apply_depth_cue,
    blinn_phong_shade_surface,
    normalize3,
)
from linevis_tpu.render.pipeline import (
    GBUFFER_PLANES,
    RasterSettings,
    TriangleBatch,
    build_payload,
)
from linevis_tpu.render.transfer_function import TransferFunction, tf_eval_points

__all__ = ["render_surface", "render_surface_image"]


def _surface_vertex_stage(
    verts, normals, attrs, tris, view_proj, width, height, z_near=1e-4
) -> TriangleBatch:
    """Indexed mesh -> per-triangle corner batch (one gather per corner)."""
    clip = view_proj[:3, :3] @ verts.T + view_proj[:3, 3][:, None]  # [3, V]
    w = view_proj[3, :3] @ verts.T + view_proj[3, 3]
    w_safe = jnp.where(jnp.abs(w) < z_near, z_near, w)
    inv_w = 1.0 / w_safe
    sx = (clip[0] * inv_w * 0.5 + 0.5) * width
    sy = (0.5 - clip[1] * inv_w * 0.5) * height
    z_ndc = clip[2] * inv_w

    idx = tris.T  # [3, T]

    def corners(v):
        return v[idx]  # [3, T]

    tri_w = corners(w)
    tri_valid = jnp.all(tri_w > z_near, axis=0)
    nrm = normals.T  # [3, V]
    big = jnp.float32(3e38)
    return TriangleBatch(
        tri_x=corners(sx),
        tri_y=corners(sy),
        tri_z=corners(z_ndc),
        tri_valid=tri_valid,
        corner_inv_w=corners(inv_w),
        corner_attr=corners(attrs),
        corner_normal=tuple(corners(nrm[c]) for c in range(3)),
        corner_tangent=tuple(jnp.zeros_like(corners(sx)) for _ in range(3)),
        view_z_min=jnp.min(jnp.where(w > z_near, w, big)),
        view_z_max=jnp.max(jnp.where(w > z_near, w, -big)),
    )


@partial(jax.jit, static_argnames=("settings",))
def render_surface(
    verts: jnp.ndarray,  # [V, 3]
    normals: jnp.ndarray,  # [V, 3]
    attrs: jnp.ndarray,  # [V]
    tris: jnp.ndarray,  # [T, 3] int32
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    settings: RasterSettings,
) -> jnp.ndarray:
    """-> [4, H, W] linear RGBA."""
    from linevis_tpu.kernels.raster_pallas import rasterize_gbuffer_pallas
    from linevis_tpu.render.opaque import _ray_basis_from_view_proj

    batch = _surface_vertex_stage(
        verts, normals, attrs, tris, view_proj,
        settings.width, settings.height,
    )
    payload = build_payload(batch)
    csr = build_csr_binning(
        batch.tri_x, batch.tri_y, payload, batch.tri_valid,
        settings.width, settings.height, settings.tile_w, settings.tile_h,
        settings.chunk, settings.span_x, settings.span_y,
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

    seg_id = unp(id_t)
    inv_w, attr_w, nx, ny, nz = (unp(attrs_t[i]) for i in range(5))
    H, W = seg_id.shape
    fg = seg_id >= 0
    inv_w = jnp.maximum(inv_w, 1e-12)
    view_z = 1.0 / inv_w
    attr = attr_w * view_z
    normal = normalize3(jnp.stack([nx, ny, nz], axis=0) * view_z[None])

    basis = _ray_basis_from_view_proj(view_proj)
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :] * (2.0 / W) - 1.0
    v = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None] * (2.0 / H)
    dirs = (
        basis[:, 0][:, None, None] * jnp.broadcast_to(u, (H, W))[None]
        + basis[:, 1][:, None, None] * jnp.broadcast_to(v, (H, W))[None]
        + basis[:, 2][:, None, None]
    )
    pos = camera_position[:, None, None] + dirs * view_z[None]

    rgb, alpha = tf_eval_points(settings.tf_color, settings.tf_opacity, attr)
    color = blinn_phong_shade_surface(rgb, pos, normal, camera_position)
    if settings.depth_cue_strength > 0.0:
        color = apply_depth_cue(
            color, view_z, batch.view_z_min, batch.view_z_max,
            settings.depth_cue_strength,
        )
    bg = jnp.asarray(settings.background_color, jnp.float32)
    out_rgb = jnp.where(fg[None], color, bg[:3, None, None])
    out_a = jnp.where(fg, alpha, bg[3])
    return jnp.concatenate([out_rgb, out_a[None]], axis=0)


def render_surface_image(
    mesh,  # loaders.mesh_loader.SurfaceMesh
    camera: Camera,
    tf: Optional[TransferFunction] = None,
    settings: Optional[RasterSettings] = None,
) -> np.ndarray:
    settings = settings or RasterSettings(
        width=camera.width, height=camera.height
    )
    if tf is not None:
        c_pts, o_pts = tf.as_static_points()
        settings = dataclasses.replace(
            settings, tf_color=c_pts, tf_opacity=o_pts
        )
    img = render_surface(
        jnp.asarray(mesh.vertices),
        jnp.asarray(mesh.normals),
        jnp.asarray(mesh.attributes),
        jnp.asarray(mesh.triangles),
        jnp.asarray(camera.view_projection_matrix()),
        jnp.asarray(np.asarray(camera.position, np.float32)),
        settings,
    )
    return np.moveaxis(np.asarray(img), 0, -1)
