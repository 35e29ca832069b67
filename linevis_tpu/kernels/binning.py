"""Screen-space tile binning — SUPERSEDED differential reference.

Production binning is `raster_pallas.build_sorted_binning` /
`build_csr_binning`; this slot-gather implementation remains only as the
independent reference for differential tests. Do not use in render paths.

TPU-native replacement for the hardware rasterizer's binning stage. The
reference feeds all triangles to the Vulkan rasterizer
(`src/Renderers/LineRasterPass.cpp`); here we bin triangles into fixed-size
pixel tiles so each tile's Pallas/XLA program only touches triangles that
can cover it (same role as the reference's meshlet culling in
`src/Renderers/Deferred/*`, but exact per tile).

All per-triangle arrays are channels-first ([3, T] corner coords, [12, T]
coefficients) so the long axis sits on TPU lanes (see
`linevis_tpu/geometry/tubes.py` for the layout rationale).

Design: each triangle emits up to SPAN_X*SPAN_Y (tile, triangle) pairs from
its screen bbox; pairs are key-sorted by tile id (deterministic, stable ->
primitive order preserved within a tile); per-tile slices are located by
binary search. Everything is static-shaped.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["TileBinning", "bin_triangles", "compute_edge_coefficients"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["tile_tri_idx", "tile_counts", "overflow"],
    meta_fields=["tiles_x", "tiles_y"],
)
@dataclasses.dataclass
class TileBinning:
    """Per-tile triangle lists.

    tile_tri_idx: [num_tiles, max_tris_per_tile] int32 — global triangle ids,
                  ascending primitive order inside each tile; -1 = empty slot.
    tile_counts:  [num_tiles] int32 — number of valid entries (clamped).
    overflow:     [] int32 — number of (tile, tri) pairs dropped by the
                  max_tris_per_tile clamp (0 in normal operation; nonzero is
                  surfaced like the reference's fragment-buffer clamp warning,
                  `PerPixelLinkedListLineRenderer.cpp:280`).
    """

    tile_tri_idx: jnp.ndarray
    tile_counts: jnp.ndarray
    overflow: jnp.ndarray
    tiles_x: int
    tiles_y: int


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_w", "tile_h", "max_tris_per_tile", "span_x", "span_y",
    ),
)
def bin_triangles(
    tri_x: jnp.ndarray,  # [3, T] screen-space x per corner
    tri_y: jnp.ndarray,  # [3, T]
    valid: jnp.ndarray,  # [T] bool
    width: int,
    height: int,
    tile_w: int = 128,
    tile_h: int = 32,
    max_tris_per_tile: int = 4096,
    span_x: int = 4,
    span_y: int = 4,
) -> TileBinning:
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    num_tiles = tiles_x * tiles_y
    T = tri_x.shape[1]

    xmin = jnp.min(tri_x, axis=0)
    xmax = jnp.max(tri_x, axis=0)
    ymin = jnp.min(tri_y, axis=0)
    ymax = jnp.max(tri_y, axis=0)

    on_screen = (xmax >= 0) & (ymax >= 0) & (xmin < width) & (ymin < height)
    valid = valid & on_screen

    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, tiles_y - 1)

    # Candidate (tile, tri) pairs from a static span window anchored at the
    # bbox min tile. Triangles whose bbox spans more tiles than the window
    # are clamped (coverage beyond the window dropped); span_x/span_y must be
    # chosen so tube triangles never exceed it at the target resolution.
    dx = jnp.arange(span_x, dtype=jnp.int32)
    dy = jnp.arange(span_y, dtype=jnp.int32)
    # [span_y, span_x, T] — T minor.
    cand_tx = tx0[None, None, :] + dx[None, :, None]
    cand_ty = ty0[None, None, :] + dy[:, None, None]
    in_range = (
        (cand_tx <= tx1[None, None, :])
        & (cand_ty <= ty1[None, None, :])
        & valid[None, None, :]
    )
    tile_id = cand_ty * tiles_x + cand_tx
    tile_id = jnp.where(in_range, tile_id, num_tiles)  # invalid -> sentinel

    flat_ids = tile_id.reshape(-1).astype(jnp.int32)
    tri_ids = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None, None, :], tile_id.shape
    ).reshape(-1)

    # Stable key sort: ties keep ascending pair index = ascending triangle id.
    sorted_ids, sorted_tris = jax.lax.sort(
        (flat_ids, tri_ids), dimension=-1, is_stable=True, num_keys=1
    )

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_ids, tile_range, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_ids, tile_range + 1, side="left").astype(jnp.int32)
    raw_counts = ends - starts
    counts = jnp.minimum(raw_counts, max_tris_per_tile)
    overflow = jnp.sum(raw_counts - counts)

    k = jnp.arange(max_tris_per_tile, dtype=jnp.int32)
    gather_pos = starts[:, None] + k[None, :]
    in_count = k[None, :] < counts[:, None]
    gather_pos = jnp.where(in_count, gather_pos, 0)
    idx = jnp.where(in_count, sorted_tris[gather_pos], -1)

    return TileBinning(
        tile_tri_idx=idx,
        tile_counts=counts,
        overflow=overflow,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
    )


def compute_edge_coefficients(
    tri_x: jnp.ndarray, tri_y: jnp.ndarray, tri_z: jnp.ndarray
) -> jnp.ndarray:
    """Per-triangle linear functionals for MXU-based coverage tests.

    tri_x/tri_y: [3, T] screen coords per corner; tri_z: [3, T] NDC depth.
    Returns coefs [12, T]: rows 3e..3e+2 = (a, b, c) of edge functional e
    (E_e(x,y) = a*x + b*y + c >= 0 inside, orientation-normalized), rows
    9..11 = (a, b, c) of the affine depth plane z(x, y).
    Degenerate triangles (|area| ~ 0) get all-rejecting edges.
    """
    x0, x1, x2 = tri_x[0], tri_x[1], tri_x[2]
    y0, y1, y2 = tri_y[0], tri_y[1], tri_y[2]

    def edge(xi, yi, xj, yj):
        return yi - yj, xj - xi, xi * yj - xj * yi

    a0, b0, c0 = edge(x1, y1, x2, y2)
    a1, b1, c1 = edge(x2, y2, x0, y0)
    a2, b2, c2 = edge(x0, y0, x1, y1)
    area2 = a0 * x0 + b0 * y0 + c0  # signed 2*area
    sign = jnp.where(area2 >= 0, 1.0, -1.0)
    degenerate = jnp.abs(area2) < 1e-12

    def fix(a, b, c):
        a = jnp.where(degenerate, 0.0, a * sign)
        b = jnp.where(degenerate, 0.0, b * sign)
        c = jnp.where(degenerate, -1.0, c * sign)
        return a, b, c

    a0, b0, c0 = fix(a0, b0, c0)
    a1, b1, c1 = fix(a1, b1, c1)
    a2, b2, c2 = fix(a2, b2, c2)

    # Depth plane via the barycentric identity z(x,y) = sum_i z_i E_i / |area2|.
    inv_area = jnp.where(degenerate, 0.0, 1.0 / jnp.abs(area2))
    z0, z1, z2 = tri_z[0], tri_z[1], tri_z[2]
    za = (z0 * a0 + z1 * a1 + z2 * a2) * inv_area
    zb = (z0 * b0 + z1 * b1 + z2 * b2) * inv_area
    zc = (z0 * c0 + z1 * c1 + z2 * c2) * inv_area

    return jnp.stack(
        [a0, b0, c0, a1, b1, c1, a2, b2, c2, za, zb, zc], axis=0
    ).astype(jnp.float32)
