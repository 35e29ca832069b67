"""Render pipeline stages: structured vertex stage, plane payloads, shading.

TPU-native replacement for the reference's gather-pass vertex/fragment
shaders (`Data/Shaders/Renderers/GeometryPass/LinePassTriangleTubes.glsl`).
Key design decisions (all driven by TPU cost model — gathers are ~30x
slower than slices/dots):

- The vertex stage projects the tube **grid** [3, S, L, P] with one matmul
  and extracts triangle corners by slicing (`geometry.tubes.corner_grids`),
  never by index gather.
- Every interpolated fragment quantity (normal, tangent, attribute, 1/w)
  is encoded as a screen-space affine **plane** per triangle (q/w is affine
  in screen space; this is the classic perspective-correct trick). The
  Pallas rasterizer evaluates these planes with the same [3,C]x[3,P] dots
  it uses for edges, and writes a G-buffer of interpolated values — so
  shading needs zero per-pixel gathers (except the 256-entry TF LUT).
- Shading is pure elementwise math over [H, W] images: fragment position is
  reconstructed from view depth and the camera ray basis.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.geometry.tubes import TubeMesh, corner_grids
from linevis_tpu.render.lighting import (
    apply_depth_cue,
    blinn_phong_shade_tube,
    normalize3,
)

__all__ = [
    "RasterSettings",
    "TriangleBatch",
    "tube_vertex_stage",
    "build_payload",
    "shade_gbuffer",
    "GBUFFER_PLANES",
]

# Interpolated fragment quantities carried as planes (beyond edges/z/id):
# inv_w, attr/w, normal/w (xyz), tangent/w (xyz)
GBUFFER_PLANES = 8


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    """Static raster configuration (shapes baked into the jitted pipeline)."""

    width: int = 800
    height: int = 600
    # Pixels per tile (tile_w*tile_h) must be a multiple of 128 (TPU lanes).
    tile_w: int = 16
    tile_h: int = 8
    chunk: int = 128
    span_x: int = 2
    span_y: int = 2
    pairs_capacity: int = 0  # 0 -> heuristic (see build_csr_binning)
    background_color: tuple = (1.0, 1.0, 1.0, 1.0)
    depth_cue_strength: float = 0.0
    # Analytic coverage AA on the opaque capsule raster (the reference's
    # MSAA role). Off: exact binary hit test (brute-force-comparable).
    aa: bool = True
    # Transfer function as static control points (pos, r, g, b linear RGB)
    # and (pos, alpha) — evaluated gather-free (tf_eval_points). Defaults to
    # the reference's Standard.xml blue-white-red map.
    tf_color: tuple = (
        (0.0, 0.04373503, 0.07227185, 0.52711511),
        (0.25, 0.27889428, 0.44520119, 0.9911021),
        (0.5, 0.71569347, 0.71569347, 0.71569347),
        (0.75, 0.91309863, 0.33245152, 0.20507874),
        (1.0, 0.45641103, 0.00121411, 0.01938236),
    )
    tf_opacity: tuple = ((0.0, 1.0), (1.0, 1.0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TriangleBatch:
    """Per-triangle screen-space data, channels-first [.., T]."""

    tri_x: jnp.ndarray  # [3, T] corner screen x
    tri_y: jnp.ndarray  # [3, T]
    tri_z: jnp.ndarray  # [3, T] NDC depth
    tri_valid: jnp.ndarray  # [T]
    # Per-corner interpolants (q values at corners), [3, T] each
    corner_inv_w: jnp.ndarray
    corner_attr: jnp.ndarray
    corner_normal: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    corner_tangent: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    # Depth-cue range inputs
    view_z_min: jnp.ndarray
    view_z_max: jnp.ndarray


def tube_vertex_stage(
    mesh: TubeMesh,
    view_proj: jnp.ndarray,  # [4, 4]
    width: int,
    height: int,
    z_near: float = 1e-4,
) -> TriangleBatch:
    """Project the tube grid and build per-triangle corner data (no gathers)."""
    S = mesh.num_subdivisions
    pos = mesh.positions  # [3, S, L, P]
    grid_shape = pos.shape[1:]
    flat = pos.reshape(3, -1)
    clip = view_proj[:3, :3] @ flat + view_proj[:3, 3][:, None]
    w = view_proj[3, :3] @ flat + view_proj[3, 3]
    w_safe = jnp.where(jnp.abs(w) < z_near, z_near, w)
    inv_w = (1.0 / w_safe).reshape(grid_shape)
    clip = clip.reshape((3,) + grid_shape)
    w = w.reshape(grid_shape)
    sx = (clip[0] * inv_w * 0.5 + 0.5) * width
    sy = (0.5 - clip[1] * inv_w * 0.5) * height
    z_ndc = clip[2] * inv_w

    def corners(g):
        c0, c1, c2 = corner_grids(g, S)
        return jnp.stack(
            [c0.reshape(-1), c1.reshape(-1), c2.reshape(-1)], axis=0
        )

    tri_x = corners(sx)
    tri_y = corners(sy)
    tri_z = corners(z_ndc)
    tri_w = corners(w)
    tri_inv_w = corners(inv_w)
    tri_attr = corners(mesh.attrs)

    def corners3(g3):
        return tuple(corners(g3[c]) for c in range(3))

    tri_n = corners3(mesh.normals)
    tri_t = corners3(mesh.tangents)

    # Validity: both segment endpoints valid AND all corners in front of the
    # near plane (conservative near-plane cull; no clipping in v1).
    seg_valid = mesh.mask[:, :-1] & mesh.mask[:, 1:]  # [L, P-1]
    tri_mask = jnp.broadcast_to(
        seg_valid[None, None], (S, 2) + seg_valid.shape
    ).reshape(-1)
    tri_valid = tri_mask & jnp.all(tri_w > z_near, axis=0)

    big = jnp.float32(3e38)
    vmask = jnp.broadcast_to(mesh.mask[None], (S,) + mesh.mask.shape)
    wg = w  # [S, L, P]
    view_z_min = jnp.min(jnp.where(vmask, wg, big))
    view_z_max = jnp.max(jnp.where(vmask, wg, -big))

    return TriangleBatch(
        tri_x=tri_x,
        tri_y=tri_y,
        tri_z=tri_z,
        tri_valid=tri_valid,
        corner_inv_w=tri_inv_w,
        corner_attr=tri_attr,
        corner_normal=tri_n,
        corner_tangent=tri_t,
        view_z_min=view_z_min,
        view_z_max=view_z_max,
    )


def _edge_functionals(tri_x, tri_y):
    """Edge coefficients + |area| inverse. Returns (9 rows list, inv_area,
    degenerate mask)."""
    x0, x1, x2 = tri_x[0], tri_x[1], tri_x[2]
    y0, y1, y2 = tri_y[0], tri_y[1], tri_y[2]

    def edge(xi, yi, xj, yj):
        return yi - yj, xj - xi, xi * yj - xj * yi

    a0, b0, c0 = edge(x1, y1, x2, y2)
    a1, b1, c1 = edge(x2, y2, x0, y0)
    a2, b2, c2 = edge(x0, y0, x1, y1)
    area2 = a0 * x0 + b0 * y0 + c0
    sign = jnp.where(area2 >= 0, 1.0, -1.0)
    degenerate = jnp.abs(area2) < 1e-12

    def fix(a, b, c):
        a = jnp.where(degenerate, 0.0, a * sign)
        b = jnp.where(degenerate, 0.0, b * sign)
        c = jnp.where(degenerate, -1.0, c * sign)
        return a, b, c

    e = [*fix(a0, b0, c0), *fix(a1, b1, c1), *fix(a2, b2, c2)]
    inv_area = jnp.where(degenerate, 0.0, 1.0 / jnp.abs(area2))
    return e, inv_area


def build_payload(batch: TriangleBatch) -> jnp.ndarray:
    """[40, T] rasterizer payload (see kernels/raster_pallas.py docstring).

    Rows: 0-8 edges; 9-11 z plane; 12-14 id plane (0,0,id); 15 zmin;
    16-18 inv_w plane; 19-21 attr/w; 22-30 normal/w; 31-39 tangent/w.
    A plane for quantity u (affine in screen space) has coefficients
    sum_i u_i * E_i / |2A| — identical structure to the depth plane.
    """
    e, inv_area = _edge_functionals(batch.tri_x, batch.tri_y)
    T = batch.tri_x.shape[1]

    def plane(u0, u1, u2):
        pa = (u0 * e[0] + u1 * e[3] + u2 * e[6]) * inv_area
        pb = (u0 * e[1] + u1 * e[4] + u2 * e[7]) * inv_area
        pc = (u0 * e[2] + u1 * e[5] + u2 * e[8]) * inv_area
        return [pa, pb, pc]

    rows = list(e)
    rows += plane(batch.tri_z[0], batch.tri_z[1], batch.tri_z[2])
    zero = jnp.zeros((T,), jnp.float32)
    ids = jnp.arange(T, dtype=jnp.float32)
    rows += [zero, zero, ids]
    # Conservative min depth, quantized DOWN to the 1/1023 sort-bucket edge
    # used by build_csr_binning's packed key, so chunk order and the kernel's
    # early-exit comparisons agree exactly.
    zmin = jnp.min(batch.tri_z, axis=0)
    rows += [jnp.floor(jnp.clip(zmin, 0.0, 1.0) * 1023.0) / 1023.0]
    iw = batch.corner_inv_w
    rows += plane(iw[0], iw[1], iw[2])

    def wplane(q):
        return plane(q[0] * iw[0], q[1] * iw[1], q[2] * iw[2])

    rows += wplane(batch.corner_attr)
    for c in range(3):
        rows += wplane(batch.corner_normal[c])
    for c in range(3):
        rows += wplane(batch.corner_tangent[c])
    return jnp.stack(rows, axis=0).astype(jnp.float32)


def shade_gbuffer(
    gbuf: dict,
    tf_table: jnp.ndarray,  # [N, 4]
    camera_position: jnp.ndarray,  # [3]
    ray_basis: jnp.ndarray,  # [3, 3]: columns scaled right, up, forward
    depth_min: jnp.ndarray,
    depth_max: jnp.ndarray,
    settings: RasterSettings,
) -> jnp.ndarray:
    """G-buffer -> [4, H, W] linear RGBA. Pure elementwise + 256-entry LUT.

    gbuf keys: 'id' [H,W] int32 (-1 background); 'inv_w', 'attr_w',
    'nx','ny','nz','tx','ty','tz' [H, W] float32 (all still premultiplied
    by 1/w except inv_w itself).
    """
    H, W = gbuf["id"].shape
    fg = gbuf["id"] >= 0
    inv_w = jnp.maximum(gbuf["inv_w"], 1e-12)
    view_z = 1.0 / inv_w
    attr = gbuf["attr_w"] * view_z
    normal = normalize3(jnp.stack([gbuf["nx"], gbuf["ny"], gbuf["nz"]], axis=0))
    tangent = normalize3(jnp.stack([gbuf["tx"], gbuf["ty"], gbuf["tz"]], axis=0))

    # Fragment position from camera ray: ndc in [-1, 1].
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :] * (2.0 / W) - 1.0
    v = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None] * (2.0 / H)
    u = jnp.broadcast_to(u, (H, W))
    v = jnp.broadcast_to(v, (H, W))
    dirs = (
        ray_basis[:, 0][:, None, None] * u[None]
        + ray_basis[:, 1][:, None, None] * v[None]
        + ray_basis[:, 2][:, None, None]
    )
    pos = camera_position[:, None, None] + dirs * view_z[None]

    # TF LUT (the only gather in the shade pass; 256-entry table).
    n = tf_table.shape[0]
    tt = tf_table.T  # [4, N]
    f = jnp.clip(attr, 0.0, 1.0) * (n - 1)
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, n - 2)
    wgt = f - i0
    lut = [tt[c][i0] * (1.0 - wgt) + tt[c][i0 + 1] * wgt for c in range(4)]
    rgb = jnp.stack(lut[:3], axis=0)
    alpha = lut[3]

    color = blinn_phong_shade_tube(rgb, pos, normal, tangent, camera_position)
    if settings.depth_cue_strength > 0.0:
        color = apply_depth_cue(
            color, view_z, depth_min, depth_max, settings.depth_cue_strength
        )

    bg = jnp.asarray(settings.background_color, jnp.float32)
    out_rgb = jnp.where(fg[None], color, bg[:3, None, None])
    out_a = jnp.where(fg, alpha, bg[3])
    return jnp.concatenate([out_rgb, out_a[None]], axis=0)
