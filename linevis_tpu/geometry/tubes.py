"""Tube / ribbon triangle meshing as batched XLA ops.

Behavioral reference: `createTriangleTubesRenderDataCPU` and variants
(`src/Renderers/Tubes/Tubes.hpp:40-150`, CPU impl `TriangleTubesCPU.cpp`):
extrude a circle (or ellipse for bands/hyperstreamlines) of
`tubeNumSubdivisions` vertices along each polyline using parallel-transport
frames; connect consecutive rings with 2 triangles per subdivision.

TPU-native redesign: all lines mesh at once from padded [L, P] arrays, and
every large per-element array is **channels-first** ([3, V] positions,
[3, T] triangle indices) so the minor axis is the long one — TPU tiles the
last two dims to (8, 128), so an [N, 3] layout would waste 42x memory and
bandwidth in lane padding. The index topology is a static integer lattice;
invalid (padded) segments are masked out of the triangle list, not skipped.

Flat vertex index convention: v(l, p, s) = s*L*P + l*P + p (ring
subdivision s is the outermost axis so meshing broadcasts with the long
L*P axis minor).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.geometry.frames import parallel_transport_frames


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TubeMesh:
    """Flattened indexed triangle mesh for the whole line set (channels-first).

    vertices:        [3, V] float32 (V = S*L*P)
    vertex_normals:  [3, V] float32
    vertex_tangents: [3, V] float32
    vertex_attrs:    [V] float32 — selected attribute per vertex
    vertex_line_id:  [V] int32
    vertex_mask:     [V] bool
    triangles:       [3, T] int32 (T = L*(P-1)*S*2)
    triangle_mask:   [T] bool
    """

    vertices: jnp.ndarray
    vertex_normals: jnp.ndarray
    vertex_tangents: jnp.ndarray
    vertex_attrs: jnp.ndarray
    vertex_line_id: jnp.ndarray
    vertex_mask: jnp.ndarray
    triangles: jnp.ndarray
    triangle_mask: jnp.ndarray

    @property
    def num_vertices(self) -> int:
        return int(self.vertices.shape[1])

    @property
    def num_triangles(self) -> int:
        return int(self.triangles.shape[1])


def tube_ring_directions(num_subdivisions: int) -> np.ndarray:
    """Unit circle directions [S, 2] (cos, sin), matching the reference's
    global circle vertices (`Tubes.hpp:159` initGlobalCircleVertexPositions)."""
    theta = 2.0 * np.pi * np.arange(num_subdivisions) / num_subdivisions
    return np.stack([np.cos(theta), np.sin(theta)], axis=-1).astype(np.float32)


@partial(jax.jit, static_argnames=("num_subdivisions",))
def _build_tube_vertices(
    positions, mask, attrs, radius, num_subdivisions, ellipse_ratio
):
    L, P = positions.shape[0], positions.shape[1]
    S = num_subdivisions
    LP = L * P
    tangents, normals, binormals = parallel_transport_frames(positions, mask)

    # Channels-first flats: [3, LP]
    pos_c = positions.reshape(LP, 3).T
    n_c = normals.reshape(LP, 3).T
    b_c = binormals.reshape(LP, 3).T
    t_c = tangents.reshape(LP, 3).T

    ring = jnp.asarray(tube_ring_directions(S))  # [S, 2]
    cosr = ring[:, 0][None, :, None]  # [1, S, 1]
    sinr = (ring[:, 1] * ellipse_ratio)[None, :, None]
    # dir3 [3, S, LP]: ring direction in the (normal, binormal) plane.
    dir3 = cosr * n_c[:, None, :] + sinr * b_c[:, None, :]
    verts = pos_c[:, None, :] + radius * dir3
    vnorm = dir3 / jnp.maximum(
        jnp.sqrt(jnp.sum(dir3 * dir3, axis=0, keepdims=True)), 1e-8
    )
    V = S * LP
    vtang = jnp.broadcast_to(t_c[:, None, :], (3, S, LP)).reshape(3, V)
    vattr = jnp.broadcast_to(attrs.reshape(1, LP), (S, LP)).reshape(V)
    vline = jnp.broadcast_to(
        (jnp.arange(LP, dtype=jnp.int32) // P).reshape(1, LP), (S, LP)
    ).reshape(V)
    vmask = jnp.broadcast_to(mask.reshape(1, LP), (S, LP)).reshape(V)
    return (
        verts.reshape(3, V),
        vnorm.reshape(3, V),
        vtang,
        vattr,
        vline,
        vmask,
    )


def _tube_topology(L: int, P: int, S: int) -> np.ndarray:
    """Static triangle index lattice [3, L*(P-1)*S*2].

    Vertex (l, p, s) has flat index s*L*P + l*P + p. Each segment quad
    (p, s)-(p, s+1)-(p+1, s)-(p+1, s+1) becomes two triangles (consistent
    winding; the renderer shades double-sided like the reference's
    abs(dot(n, l)) tube shading).
    """
    l = np.arange(L)[:, None, None]
    p = np.arange(P - 1)[None, :, None]
    s = np.arange(S)[None, None, :]
    s1 = (s + 1) % S

    def vid(pp, ss):
        return ss * (L * P) + l * P + pp

    i00 = vid(p, s)
    i01 = vid(p, s1)
    i10 = vid(p + 1, s)
    i11 = vid(p + 1, s1)
    tri_a = np.stack(np.broadcast_arrays(i00, i01, i11), axis=0)  # [3, L, P-1, S]
    tri_b = np.stack(np.broadcast_arrays(i00, i11, i10), axis=0)
    # Interleave a/b per quad: [3, L, P-1, S, 2]
    tris = np.stack([tri_a, tri_b], axis=-1).reshape(3, -1)
    return tris.astype(np.int32)


def build_tube_triangle_mesh(
    positions: jnp.ndarray,
    mask: jnp.ndarray,
    attrs: jnp.ndarray,
    radius: float = 0.0025,
    num_subdivisions: int = 8,
    ellipse_ratio: float = 1.0,
) -> TubeMesh:
    """Mesh all padded lines into one indexed triangle soup (channels-first).

    positions [L, P, 3], mask [L, P], attrs [L, P] (selected attribute).
    Default radius mirrors the reference's default line width
    (`STANDARD_LINE_WIDTH` 0.002, `src/Renderers/LineRenderer.hpp:266-276`;
    radius = width/2 semantics are preserved by callers).
    """
    L, P = int(positions.shape[0]), int(positions.shape[1])
    S = int(num_subdivisions)
    verts, vnorm, vtang, vattr, vline, vmask = _build_tube_vertices(
        jnp.asarray(positions),
        jnp.asarray(mask),
        jnp.asarray(attrs),
        float(radius),
        S,
        float(ellipse_ratio),
    )
    tris = jnp.asarray(_tube_topology(L, P, S))
    seg_valid = jnp.asarray(np.asarray(mask)[:, :-1] & np.asarray(mask)[:, 1:])
    tri_mask = jnp.broadcast_to(
        seg_valid[:, :, None, None], (L, P - 1, S, 2)
    ).reshape(-1)
    return TubeMesh(
        vertices=verts,
        vertex_normals=vnorm,
        vertex_tangents=vtang,
        vertex_attrs=vattr,
        vertex_line_id=vline,
        vertex_mask=vmask,
        triangles=tris,
        triangle_mask=tri_mask,
    )
