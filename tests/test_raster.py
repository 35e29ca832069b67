"""Rasterizer tests: binning vs brute force, z-buffer correctness vs a
naive per-pixel reference rasterizer."""

import jax.numpy as jnp
import numpy as np

from linevis_tpu.kernels.binning import bin_triangles, compute_edge_coefficients
from linevis_tpu.kernels.raster_xla import rasterize_depth_tiles, unpack_tiles

W, H = 64, 32
TILE_W, TILE_H = 32, 16


def _naive_raster(tri_xy, tri_z, valid, width, height):
    """Brute-force per-pixel reference (inside test via same edge rule)."""
    depth = np.full((height, width), 2.0, np.float64)
    tid = np.full((height, width), -1, np.int64)
    for t in range(tri_xy.shape[0]):
        if not valid[t]:
            continue
        (x0, y0), (x1, y1), (x2, y2) = tri_xy[t]
        area2 = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        if abs(area2) < 1e-12:
            continue
        for py in range(height):
            for px in range(width):
                x, y = px + 0.5, py + 0.5
                l0 = ((y1 - y2) * (x - x2) + (x2 - x1) * (y - y2)) / area2
                l1 = ((y2 - y0) * (x - x2) + (x0 - x2) * (y - y2)) / area2
                l2 = 1 - l0 - l1
                if l0 >= 0 and l1 >= 0 and l2 >= 0:
                    z = l0 * tri_z[t, 0] + l1 * tri_z[t, 1] + l2 * tri_z[t, 2]
                    if 0 <= z <= 1 and z < depth[py, px]:
                        depth[py, px] = z
                        tid[py, px] = t
    return depth, tid


def _random_triangles(rng, n):
    tri_xy = rng.uniform(-8, 72, size=(n, 3, 2)).astype(np.float32)
    tri_z = rng.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32)
    valid = np.ones((n,), bool)
    return tri_xy, tri_z, valid


def _to_cf(tri_xy, tri_z):
    """[T,3,2]/[T,3] corner-major -> channels-first ([3,T] x, y, z)."""
    return (
        jnp.asarray(tri_xy[:, :, 0].T),
        jnp.asarray(tri_xy[:, :, 1].T),
        jnp.asarray(tri_z.T),
    )


def _run_pipeline(tri_xy, tri_z, valid, max_tris=64, span=3):
    tx, ty, tz = _to_cf(tri_xy, tri_z)
    binning = bin_triangles(
        tx, ty, jnp.asarray(valid), W, H, TILE_W, TILE_H,
        max_tris_per_tile=max_tris, span_x=span, span_y=span,
    )
    coefs = compute_edge_coefficients(tx, ty, tz)
    d_t, i_t = rasterize_depth_tiles(binning, coefs, TILE_W, TILE_H, chunk=16)
    depth = np.asarray(
        unpack_tiles(d_t, binning.tiles_x, binning.tiles_y, TILE_W, TILE_H, W, H)
    )
    tid = np.asarray(
        unpack_tiles(i_t, binning.tiles_x, binning.tiles_y, TILE_W, TILE_H, W, H)
    )
    return depth, tid, binning


def test_binning_covers_bruteforce(rng):
    tri_xy, tri_z, valid = _random_triangles(rng, 40)
    tx, ty, _ = _to_cf(tri_xy, tri_z)
    binning = bin_triangles(
        tx, ty, jnp.asarray(valid), W, H, TILE_W, TILE_H,
        max_tris_per_tile=64, span_x=3, span_y=3,
    )
    idx = np.asarray(binning.tile_tri_idx)
    counts = np.asarray(binning.tile_counts)
    tiles_x = binning.tiles_x
    # Brute force: triangle t belongs to tile if bbox overlaps.
    for t in range(40):
        xmin, ymin = tri_xy[t].min(0)
        xmax, ymax = tri_xy[t].max(0)
        if xmax < 0 or ymax < 0 or xmin >= W or ymin >= H:
            continue
        tx0 = int(np.clip(xmin // TILE_W, 0, tiles_x - 1))
        tx1 = int(np.clip(xmax // TILE_W, 0, tiles_x - 1))
        ty0 = int(np.clip(ymin // TILE_H, 0, binning.tiles_y - 1))
        ty1 = int(np.clip(ymax // TILE_H, 0, binning.tiles_y - 1))
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                tile = ty * tiles_x + tx
                assert t in idx[tile, : counts[tile]], (t, tile)


def test_raster_matches_naive(rng):
    tri_xy, tri_z, valid = _random_triangles(rng, 30)
    depth, tid, binning = _run_pipeline(tri_xy, tri_z, valid)
    assert int(binning.overflow) == 0
    ref_depth, ref_tid = _naive_raster(tri_xy, tri_z, valid, W, H)
    # Pixels on triangle edges may differ due to float precision; allow a
    # tiny mismatch budget.
    mismatch = (tid != ref_tid).mean()
    assert mismatch < 0.01, f"mismatch fraction {mismatch}"
    covered = (tid >= 0) & (ref_tid >= 0) & (tid == ref_tid)
    np.testing.assert_allclose(depth[covered], ref_depth[covered], atol=1e-4)


def test_raster_depth_order():
    # Two overlapping triangles; the nearer one must win.
    tri_xy = np.array(
        [
            [[4, 4], [28, 4], [4, 28]],
            [[4, 4], [28, 4], [4, 28]],
        ],
        np.float32,
    )
    tri_z = np.array([[0.5, 0.5, 0.5], [0.2, 0.2, 0.2]], np.float32)
    valid = np.ones((2,), bool)
    depth, tid, _ = _run_pipeline(tri_xy, tri_z, valid)
    inside = tid >= 0
    assert inside.any()
    assert (tid[inside] == 1).all()
    np.testing.assert_allclose(depth[inside], 0.2, atol=1e-5)


def test_raster_masked_triangles_skipped():
    tri_xy = np.array([[[4, 4], [28, 4], [4, 28]]], np.float32)
    tri_z = np.array([[0.5, 0.5, 0.5]], np.float32)
    depth, tid, _ = _run_pipeline(tri_xy, tri_z, np.zeros((1,), bool))
    assert (tid == -1).all()
