"""Tile rasterization core (pure XLA) — SUPERSEDED differential reference.

The production rasterizers are the Pallas kernels (`raster_pallas.py`,
`raster_capsule.py`); this first-generation XLA-scan implementation is kept
only as an independent reference for differential tests
(`tests/test_raster_pallas.py` checks Pallas == XLA-scan). Do not use it in
new render paths.

The inner loop is expressed so XLA maps it onto the MXU: coverage + depth of
a chunk of C triangles against all P pixels of a tile is one batched matmul
`[3, 4C]^T x [3, P] -> [4C, P]` of per-triangle linear functionals (3 edges
+ depth plane; see `binning.compute_edge_coefficients`) against pixel rows
(x, y, 1). A `lax.scan` over chunks keeps the [4C, P] intermediate bounded,
and `vmap` over tiles batches the matmul. The long pixel axis is always
minor (TPU (8, 128) tiling).

This replaces the Vulkan rasterizer + depth test consumed by the reference's
`LineRasterPass` (`src/Renderers/LineRasterPass.hpp:39-83`). Output is a
(depth, triangle-id) visibility G-buffer in the spirit of the reference's
deferred visibility-buffer renderer (`src/Renderers/Deferred/DeferredRenderer`),
shaded later in one deferred pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from linevis_tpu.kernels.binning import TileBinning
from linevis_tpu.kernels.tiles import unpack_tiles  # re-export (legacy import path)

__all__ = ["rasterize_depth_tiles", "unpack_tiles", "gather_tile_payload", "tile_pixel_rows"]


def tile_pixel_rows(tiles_x: int, n_tiles: int, tile_w: int, tile_h: int) -> jnp.ndarray:
    """[n_tiles, 3, P] pixel-center rows (x, y, 1); P index = ly*tile_w + lx."""
    P = tile_w * tile_h
    tile_index = jnp.arange(n_tiles, dtype=jnp.int32)
    ty = (tile_index // tiles_x).astype(jnp.float32)
    tx = (tile_index % tiles_x).astype(jnp.float32)
    local = jnp.arange(P, dtype=jnp.float32)
    local_y = jnp.floor(local / tile_w)
    local_x = local - local_y * tile_w
    gx = tx[:, None] * tile_w + local_x[None, :] + 0.5
    gy = ty[:, None] * tile_h + local_y[None, :] + 0.5
    ones = jnp.ones((n_tiles, P), jnp.float32)
    return jnp.stack([gx, gy, ones], axis=1)  # [n_tiles, 3, P]


def gather_tile_payload(binning: TileBinning, payload: jnp.ndarray, chunk: int):
    """Pre-gather a [F, T] per-triangle payload into scan-ready chunks.

    Returns (chunks [num_chunks, n_tiles, F, chunk],
             valid [num_chunks, n_tiles, chunk],
             ids [num_chunks, n_tiles, chunk]).
    One big gather per frame; the scan then reads dense slices.
    """
    idx = binning.tile_tri_idx  # [n_tiles, MAX_T]
    n_tiles, max_t = idx.shape
    num_chunks = max_t // chunk
    assert num_chunks * chunk == max_t, "max_tris_per_tile must divide by chunk"
    F = payload.shape[0]
    safe_idx = jnp.maximum(idx, 0)
    g = payload[:, safe_idx]  # [F, n_tiles, MAX_T]
    g = g.reshape(F, n_tiles, num_chunks, chunk).transpose(2, 1, 0, 3)
    valid = (idx >= 0).reshape(n_tiles, num_chunks, chunk).transpose(1, 0, 2)
    ids = safe_idx.reshape(n_tiles, num_chunks, chunk).transpose(1, 0, 2)
    return g, valid, ids


@partial(jax.jit, static_argnames=("tile_w", "tile_h", "chunk"))
def rasterize_depth_tiles(
    binning: TileBinning,
    coefs: jnp.ndarray,  # [12, T] from compute_edge_coefficients
    tile_w: int = 128,
    tile_h: int = 32,
    chunk: int = 128,
):
    """Z-buffer pass. Returns (depth [n_tiles, P], tri_id [n_tiles, P]).

    Depth is NDC z in [0, 1]; background pixels have depth 2.0 and id -1.
    Ties in depth resolve to the lowest triangle id (deterministic).
    """
    n_tiles = binning.tile_tri_idx.shape[0]
    P = tile_w * tile_h
    C = chunk

    tile_coefs, slot_valid, tile_ids = gather_tile_payload(binning, coefs, chunk)
    A = tile_pixel_rows(binning.tiles_x, n_tiles, tile_w, tile_h)  # [n_tiles, 3, P]

    def body(state, inputs):
        zbuf, ibuf = state
        c_coefs, c_valid, c_ids = inputs  # [n_tiles, 12, C], [n_tiles, C] x2
        # M [n_tiles, 3, 4C]: edge0 | edge1 | edge2 | depth blocks.
        M = jnp.concatenate(
            [c_coefs[:, 0:3], c_coefs[:, 3:6], c_coefs[:, 6:9], c_coefs[:, 9:12]],
            axis=-1,
        ).transpose(0, 2, 1)  # [n_tiles, 4C, 3]
        vals = jax.lax.dot_general(
            M,
            A,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [n_tiles, 4C, P]
        e0 = vals[:, 0:C]
        e1 = vals[:, C : 2 * C]
        e2 = vals[:, 2 * C : 3 * C]
        z = vals[:, 3 * C : 4 * C]
        inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & c_valid[:, :, None]
        inside &= (z >= 0.0) & (z <= 1.0)
        z_masked = jnp.where(inside, z, jnp.inf)  # [n_tiles, C, P]
        best = jnp.argmin(z_masked, axis=1)  # [n_tiles, P] (ties -> low slot)
        best_z = jnp.min(z_masked, axis=1)
        best_id = jnp.take_along_axis(c_ids, best, axis=1)
        take = best_z < zbuf
        zbuf = jnp.where(take, best_z, zbuf)
        ibuf = jnp.where(take, best_id, ibuf)
        return (zbuf, ibuf), None

    z0 = jnp.full((n_tiles, P), 2.0, jnp.float32)
    i0 = jnp.full((n_tiles, P), -1, jnp.int32)
    (zbuf, ibuf), _ = jax.lax.scan(
        body, (z0, i0), (tile_coefs, slot_valid, tile_ids)
    )
    return zbuf, ibuf



