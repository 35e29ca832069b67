"""Shared render pipeline stages: vertex transform, deferred shading.

TPU-native replacement for the reference's gather-pass vertex/fragment
shaders (`Data/Shaders/Renderers/GeometryPass/LinePassTriangleTubes.glsl`):
the vertex stage is one [3, V] matmul against the view-projection matrix;
interpolation happens once per visible pixel in a deferred pass with
perspective-correct barycentrics. All big arrays are channels-first
([3, V] / [3, T] / per-component [H, W]) — see
`linevis_tpu/geometry/tubes.py` for the TPU layout rationale.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from linevis_tpu.geometry.tubes import TubeMesh
from linevis_tpu.render.lighting import apply_depth_cue, blinn_phong_shade_tube

__all__ = ["VertexStageOutput", "vertex_stage", "deferred_shade", "RasterSettings"]


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    """Static raster configuration (shapes baked into the jitted pipeline)."""

    width: int = 800
    height: int = 600
    # Pixels per tile (tile_w*tile_h) must be a multiple of 128 (TPU lanes).
    tile_w: int = 16
    tile_h: int = 8
    chunk: int = 128
    span_x: int = 3
    span_y: int = 3
    pairs_capacity: int = 0  # 0 -> exact upper bound span_x*span_y*T
    background_color: tuple = (1.0, 1.0, 1.0, 1.0)
    depth_cue_strength: float = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VertexStageOutput:
    sx: jnp.ndarray  # [V] screen pixel x
    sy: jnp.ndarray  # [V] screen pixel y
    z_ndc: jnp.ndarray  # [V]
    inv_w: jnp.ndarray  # [V] 1/clip.w (positive in front of camera)
    view_z: jnp.ndarray  # [V] distance along view dir (= clip.w)
    tri_x: jnp.ndarray  # [3, T]
    tri_y: jnp.ndarray  # [3, T]
    tri_z: jnp.ndarray  # [3, T]
    tri_valid: jnp.ndarray  # [T]


def vertex_stage(
    vertices: jnp.ndarray,  # [3, V]
    triangles: jnp.ndarray,  # [3, T]
    triangle_mask: jnp.ndarray,  # [T]
    view_proj: jnp.ndarray,  # [4, 4]
    width: int,
    height: int,
    z_near: float = 1e-4,
) -> VertexStageOutput:
    clip = view_proj[:3, :3] @ vertices + view_proj[:3, 3][:, None]  # [3, V]
    w = view_proj[3, :3] @ vertices + view_proj[3, 3]  # [V]
    w_safe = jnp.where(jnp.abs(w) < z_near, z_near, w)
    inv_w = 1.0 / w_safe
    sx = (clip[0] * inv_w * 0.5 + 0.5) * width
    sy = (0.5 - clip[1] * inv_w * 0.5) * height
    z_ndc = clip[2] * inv_w

    tri_x = sx[triangles]  # [3, T]
    tri_y = sy[triangles]
    tri_z = z_ndc[triangles]
    tri_w = w[triangles]
    # Cull triangles with any vertex at/behind the near plane (no clipping in
    # v1 — tube geometry crossing the near plane is dropped conservatively).
    tri_valid = triangle_mask & jnp.all(tri_w > z_near, axis=0)
    return VertexStageOutput(
        sx=sx, sy=sy, z_ndc=z_ndc, inv_w=inv_w, view_z=w,
        tri_x=tri_x, tri_y=tri_y, tri_z=tri_z, tri_valid=tri_valid,
    )


def _pixel_centers(height: int, width: int):
    px = jnp.broadcast_to(
        (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :], (height, width)
    )
    py = jnp.broadcast_to(
        (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None], (height, width)
    )
    return px, py


def interpolants_at_pixels(
    tri_id: jnp.ndarray,  # [H, W] int32, -1 = background
    triangles: jnp.ndarray,  # [3, T]
    vs: VertexStageOutput,
):
    """Per-pixel corner indices + perspective-correct barycentric weights.

    Returns (corner_idx [3][H, W], lam [3][H, W]) as tuples of 2-D arrays.
    """
    H, W = tri_id.shape
    tid = jnp.maximum(tri_id, 0)
    i = [triangles[k][tid] for k in range(3)]  # 3 x [H, W]
    x = [vs.sx[ik] for ik in i]
    y = [vs.sy[ik] for ik in i]
    iw = [vs.inv_w[ik] for ik in i]

    px, py = _pixel_centers(H, W)
    d = (y[1] - y[2]) * (x[0] - x[2]) + (x[2] - x[1]) * (y[0] - y[2])
    d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    l0 = ((y[1] - y[2]) * (px - x[2]) + (x[2] - x[1]) * (py - y[2])) / d
    l1 = ((y[2] - y[0]) * (px - x[2]) + (x[0] - x[2]) * (py - y[2])) / d
    l2 = 1.0 - l0 - l1
    # Perspective correction: weight by 1/w and renormalize.
    pw = [l0 * iw[0], l1 * iw[1], l2 * iw[2]]
    norm = jnp.maximum(pw[0] + pw[1] + pw[2], 1e-12)
    lam = [p / norm for p in pw]
    return i, lam


def interp_scalar(data: jnp.ndarray, idx, lam) -> jnp.ndarray:
    """Interpolate a [V] vertex scalar at pixels -> [H, W]."""
    return lam[0] * data[idx[0]] + lam[1] * data[idx[1]] + lam[2] * data[idx[2]]


def interp_vec3(data: jnp.ndarray, idx, lam) -> jnp.ndarray:
    """Interpolate a [3, V] vertex vector at pixels -> [3, H, W]."""
    return jnp.stack([interp_scalar(data[c], idx, lam) for c in range(3)], axis=0)


def tf_lookup_image(tf_table: jnp.ndarray, attr: jnp.ndarray):
    """LUT sample: attr [H, W] in [0,1] -> (rgb [3, H, W], alpha [H, W])."""
    n = tf_table.shape[0]
    tt = tf_table.T  # [4, N]
    f = jnp.clip(attr, 0.0, 1.0) * (n - 1)
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, n - 2)
    w = f - i0
    out = [tt[c][i0] * (1.0 - w) + tt[c][i0 + 1] * w for c in range(4)]
    return jnp.stack(out[:3], axis=0), out[3]


def deferred_shade(
    tri_id: jnp.ndarray,  # [H, W] int32, -1 = background
    mesh: TubeMesh,
    vs: VertexStageOutput,
    tf_table: jnp.ndarray,  # [N, 4]
    camera_position: jnp.ndarray,  # [3]
    depth_min: jnp.ndarray,
    depth_max: jnp.ndarray,
    settings: RasterSettings,
) -> jnp.ndarray:
    """Shade the visibility buffer -> [4, H, W] linear RGBA (channels-first)."""
    fg = tri_id >= 0
    idx, lam = interpolants_at_pixels(tri_id, mesh.triangles, vs)

    pos = interp_vec3(mesh.vertices, idx, lam)
    normal = interp_vec3(mesh.vertex_normals, idx, lam)
    tangent = interp_vec3(mesh.vertex_tangents, idx, lam)
    attr = interp_scalar(mesh.vertex_attrs, idx, lam)
    view_z = interp_scalar(vs.view_z, idx, lam)

    rgb, alpha = tf_lookup_image(tf_table, attr)
    color = blinn_phong_shade_tube(rgb, pos, normal, tangent, camera_position)
    if settings.depth_cue_strength > 0.0:
        color = apply_depth_cue(
            color, view_z, depth_min, depth_max, settings.depth_cue_strength
        )

    bg = jnp.asarray(settings.background_color, jnp.float32)
    out_rgb = jnp.where(fg[None], color, bg[:3, None, None])
    out_a = jnp.where(fg, alpha, bg[3])
    return jnp.concatenate([out_rgb, out_a[None]], axis=0)
