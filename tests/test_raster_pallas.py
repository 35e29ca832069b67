"""Pallas CSR rasterizer vs the brute-force naive reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from linevis_tpu.kernels.binning import compute_edge_coefficients
from linevis_tpu.kernels.raster_pallas import build_csr_binning, rasterize_depth_pallas
from linevis_tpu.kernels.tiles import unpack_tiles

from tests.test_raster import _naive_raster, _random_triangles, _to_cf

W, H = 64, 32
TILE_W, TILE_H = 16, 8


def _run(tri_xy, tri_z, valid, chunk=16):
    tx, ty, tz = _to_cf(tri_xy, tri_z)
    coefs = compute_edge_coefficients(tx, ty, tz)
    T = coefs.shape[1]
    zero = jnp.zeros((2, T), jnp.float32)
    ids = jnp.arange(T, dtype=jnp.float32)[None]
    zmin = jnp.min(tz, axis=0)[None]
    payload = jnp.concatenate([coefs, zero, ids, zmin], axis=0)
    csr = build_csr_binning(
        tx, ty, payload, jnp.asarray(valid), W, H, TILE_W, TILE_H,
        chunk=chunk, span_x=4, span_y=4,
    )
    d_t, i_t = rasterize_depth_pallas(csr, TILE_W, TILE_H, interpret=True)
    depth = np.asarray(unpack_tiles(d_t, csr.tiles_x, csr.tiles_y, TILE_W, TILE_H, W, H))
    tid = np.asarray(unpack_tiles(i_t, csr.tiles_x, csr.tiles_y, TILE_W, TILE_H, W, H))
    return depth, tid, csr


def test_pallas_matches_naive(rng):
    tri_xy, tri_z, valid = _random_triangles(rng, 25)
    depth, tid, csr = _run(tri_xy, tri_z, valid)
    assert int(csr.overflow) == 0
    ref_depth, ref_tid = _naive_raster(tri_xy, tri_z, valid, W, H)
    mismatch = (tid != ref_tid).mean()
    assert mismatch < 0.01, f"mismatch fraction {mismatch}"
    covered = (tid >= 0) & (ref_tid >= 0) & (tid == ref_tid)
    np.testing.assert_allclose(depth[covered], ref_depth[covered], atol=1e-4)


def test_pallas_matches_xla_pipeline(rng):
    from linevis_tpu.kernels.binning import bin_triangles
    from linevis_tpu.kernels.raster_xla import rasterize_depth_tiles

    tri_xy, tri_z, valid = _random_triangles(rng, 40)
    depth_p, tid_p, _ = _run(tri_xy, tri_z, valid)

    tx, ty, tz = _to_cf(tri_xy, tri_z)
    binning = bin_triangles(
        tx, ty, jnp.asarray(valid), W, H, TILE_W, TILE_H,
        max_tris_per_tile=64, span_x=4, span_y=4,
    )
    coefs = compute_edge_coefficients(tx, ty, tz)
    d_t, i_t = rasterize_depth_tiles(binning, coefs, TILE_W, TILE_H, chunk=16)
    depth_x = np.asarray(unpack_tiles(d_t, binning.tiles_x, binning.tiles_y, TILE_W, TILE_H, W, H))
    tid_x = np.asarray(unpack_tiles(i_t, binning.tiles_x, binning.tiles_y, TILE_W, TILE_H, W, H))
    np.testing.assert_array_equal(tid_p, tid_x)
    np.testing.assert_allclose(depth_p, np.where(depth_x == 2.0, 2.0, depth_x), atol=1e-6)


def test_pallas_empty_scene():
    tri_xy = np.zeros((4, 3, 2), np.float32)
    tri_z = np.full((4, 3), 0.5, np.float32)
    depth, tid, _ = _run(tri_xy, tri_z, np.zeros((4,), bool))
    assert (tid == -1).all()
    assert (depth == 2.0).all()
