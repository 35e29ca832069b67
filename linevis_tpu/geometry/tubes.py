"""Tube / ribbon triangle meshing as batched XLA ops.

Behavioral reference: `createTriangleTubesRenderDataCPU` and variants
(`src/Renderers/Tubes/Tubes.hpp:40-150`, CPU impl `TriangleTubesCPU.cpp`):
extrude a circle (or ellipse for bands/hyperstreamlines) of
`tubeNumSubdivisions` vertices along each polyline using parallel-transport
frames; connect consecutive rings with 2 triangles per subdivision.

TPU-native redesign:
- all lines mesh at once from padded [L, P] arrays;
- every large per-vertex array is kept **grid-shaped** [3, S, L, P]
  (component, ring subdivision, line, point) with the long L*P axes minor,
  so the render pipeline extracts triangle-corner arrays with pure slices
  and rolls — zero gathers (TPU gathers are ~30x slower than slices);
- triangle ordering is (s, a, l, p) — ring subdivision and quad-half
  outermost — so per-corner arrays [S, 2, L, P-1] are lane-friendly;
- invalid (padded) segments are masked out of the triangle list.

Flat vertex index (for the indexed view): v(s, l, p) = s*L*P + l*P + p.
Flat triangle index: tri(s, a, l, p) = ((s*2 + a)*L + l)*(P-1) + p.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.geometry.frames import parallel_transport_frames


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "positions", "normals", "tangents", "attrs", "mask",
        "triangles", "triangle_mask",
    ],
    meta_fields=["num_subdivisions"],
)
@dataclasses.dataclass
class TubeMesh:
    """Tube surface for the whole line set, grid-shaped (channels-first).

    positions: [3, S, L, P] float32 — ring vertex positions
    normals:   [3, S, L, P] float32 — outward surface normals
    tangents:  [3, S, L, P] float32 — line tangents
    attrs:     [S, L, P] float32 — selected attribute per vertex
    mask:      [L, P] bool — valid line points
    triangles: [3, T] int32 — indexed view (T = S*2*L*(P-1)), flat vertex ids
    triangle_mask: [T] bool
    """

    positions: jnp.ndarray
    normals: jnp.ndarray
    tangents: jnp.ndarray
    attrs: jnp.ndarray
    mask: jnp.ndarray
    triangles: jnp.ndarray
    triangle_mask: jnp.ndarray
    num_subdivisions: int

    @property
    def grid_shape(self):
        return self.positions.shape[1:]  # (S, L, P)

    @property
    def num_vertices(self) -> int:
        s, l, p = self.grid_shape
        return s * l * p

    @property
    def num_triangles(self) -> int:
        return int(self.triangles.shape[1])

    # Flat [3, V] / [V] views for generic consumers (RT BVH, tests).
    @property
    def vertices(self) -> jnp.ndarray:
        return self.positions.reshape(3, -1)

    @property
    def vertex_normals(self) -> jnp.ndarray:
        return self.normals.reshape(3, -1)

    @property
    def vertex_tangents(self) -> jnp.ndarray:
        return self.tangents.reshape(3, -1)

    @property
    def vertex_attrs(self) -> jnp.ndarray:
        return self.attrs.reshape(-1)

    @property
    def vertex_mask(self) -> jnp.ndarray:
        S = self.positions.shape[1]
        return jnp.broadcast_to(self.mask[None], (S,) + self.mask.shape).reshape(-1)


def tube_ring_directions(num_subdivisions: int) -> np.ndarray:
    """Unit circle directions [S, 2] (cos, sin), matching the reference's
    global circle vertices (`Tubes.hpp:159` initGlobalCircleVertexPositions)."""
    theta = 2.0 * np.pi * np.arange(num_subdivisions) / num_subdivisions
    return np.stack([np.cos(theta), np.sin(theta)], axis=-1).astype(np.float32)


@partial(jax.jit, static_argnames=("num_subdivisions",))
def _build_tube_grids(positions, mask, attrs, radius, num_subdivisions, ellipse_ratio):
    L, P = positions.shape[0], positions.shape[1]
    S = num_subdivisions
    LP = L * P
    tangents, normals, binormals = parallel_transport_frames(positions, mask)

    pos_c = positions.reshape(LP, 3).T.reshape(3, 1, L, P)
    n_c = normals.reshape(LP, 3).T.reshape(3, 1, L, P)
    b_c = binormals.reshape(LP, 3).T.reshape(3, 1, L, P)
    t_c = tangents.reshape(LP, 3).T.reshape(3, 1, L, P)

    ring = jnp.asarray(tube_ring_directions(S))  # [S, 2]
    cosr = ring[:, 0].reshape(1, S, 1, 1)
    sinr = (ring[:, 1] * ellipse_ratio).reshape(1, S, 1, 1)
    dir3 = cosr * n_c + sinr * b_c  # [3, S, L, P]
    verts = pos_c + radius * dir3
    vnorm = dir3 / jnp.maximum(
        jnp.sqrt(jnp.sum(dir3 * dir3, axis=0, keepdims=True)), 1e-8
    )
    vtang = jnp.broadcast_to(t_c, (3, S, L, P))
    vattr = jnp.broadcast_to(attrs[None], (S, L, P))
    return verts, vnorm, vtang, vattr


def _tube_topology(L: int, P: int, S: int) -> np.ndarray:
    """Static triangle index lattice [3, T], T ordered (s, a, l, p).

    Quad (l, p, s): corners v(s,l,p), v(s+1,l,p), v(s,l,p+1), v(s+1,l,p+1).
    Triangle a=0: (v(s,l,p), v(s1,l,p), v(s1,l,p+1));
    triangle a=1: (v(s,l,p), v(s1,l,p+1), v(s,l,p+1)).
    """
    s = np.arange(S)[:, None, None, None]
    a = np.arange(2)[None, :, None, None]
    l = np.arange(L)[None, None, :, None]
    p = np.arange(P - 1)[None, None, None, :]
    s1 = (s + 1) % S

    def vid(ss, pp):
        return ss * (L * P) + l * P + pp

    c0 = np.broadcast_to(vid(s, p), (S, 2, L, P - 1))
    c1 = np.where(a == 0, vid(s1, p), vid(s1, p + 1))
    c2 = np.where(a == 0, vid(s1, p + 1), vid(s, p + 1))
    return np.stack([c0, c1, c2]).reshape(3, -1).astype(np.int32)


def corner_grids(grid: jnp.ndarray, num_subdivisions: int):
    """Extract the 3 triangle-corner arrays from a grid-shaped quantity.

    grid: [..., S, L, P] -> 3 arrays [..., S, 2, L, P-1] ordered like the
    flat triangle index (s, a, l, p). Pure slices + a roll — no gathers.
    """
    S = num_subdivisions
    r = jnp.roll(grid, -1, axis=-3)  # ring s+1
    lo = grid[..., :, :, :-1]  # v(s, l, p)
    lo1 = grid[..., :, :, 1:]  # v(s, l, p+1)
    ro = r[..., :, :, :-1]  # v(s1, l, p)
    ro1 = r[..., :, :, 1:]  # v(s1, l, p+1)

    def two(x0, x1):
        return jnp.stack([x0, x1], axis=-3)  # a-axis before (L, P-1)

    c0 = two(lo, lo)
    c1 = two(ro, ro1)
    c2 = two(ro1, lo1)
    return c0, c1, c2


def build_tube_triangle_mesh(
    positions: jnp.ndarray,
    mask: jnp.ndarray,
    attrs: jnp.ndarray,
    radius: float = 0.0025,
    num_subdivisions: int = 8,
    ellipse_ratio: float = 1.0,
) -> TubeMesh:
    """Mesh all padded lines into one tube surface (grid-shaped).

    positions [L, P, 3], mask [L, P], attrs [L, P] (selected attribute).
    Default radius mirrors the reference's default line width
    (`STANDARD_LINE_WIDTH` 0.002, `src/Renderers/LineRenderer.hpp:266-276`;
    radius = width/2 semantics are preserved by callers).
    """
    L, P = int(positions.shape[0]), int(positions.shape[1])
    S = int(num_subdivisions)
    verts, vnorm, vtang, vattr = _build_tube_grids(
        jnp.asarray(positions),
        jnp.asarray(mask),
        jnp.asarray(attrs),
        float(radius),
        S,
        float(ellipse_ratio),
    )
    tris = jnp.asarray(_tube_topology(L, P, S))
    m = np.asarray(mask)
    seg_valid = jnp.asarray(m[:, :-1] & m[:, 1:])  # [L, P-1]
    tri_mask = jnp.broadcast_to(
        seg_valid[None, None], (S, 2, L, P - 1)
    ).reshape(-1)
    return TubeMesh(
        positions=verts,
        normals=vnorm,
        tangents=vtang,
        attrs=vattr,
        mask=jnp.asarray(mask),
        triangles=tris,
        triangle_mask=tri_mask,
        num_subdivisions=S,
    )
