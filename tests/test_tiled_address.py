"""Tiled addressing modes (Data/Shaders/Utils/TiledAddress.glsl)."""

import numpy as np
import pytest

from linevis_tpu.kernels.tiled_address import (
    MORTON_8X8,
    addr_gen,
    pack_image,
    unpack_image,
)


@pytest.mark.parametrize("mode,kw", [
    ("linear", {}),
    ("tiled", dict(tile_n=2, tile_m=2)),
    ("tiled", dict(tile_n=2, tile_m=8)),
    ("morton", {}),
])
def test_addressing_is_a_permutation(mode, kw):
    W, H = 32, 16
    ys, xs = np.mgrid[0:H, 0:W]
    addr = addr_gen(xs, ys, W, mode, **kw)
    assert sorted(addr.reshape(-1).tolist()) == list(range(W * H))


def test_morton_matches_reference_table():
    """First 8x8 tile maps exactly through mortonCodeLookupTable
    (TiledAddress.glsl:37-46)."""
    for y in range(8):
        for x in range(8):
            assert addr_gen(x, y, 64, "morton") == MORTON_8X8[x + 8 * y]


def test_morton_locality():
    """2x2 quads are contiguous in memory (the curve's whole point)."""
    a = addr_gen(np.array([0, 1, 0, 1]), np.array([0, 0, 1, 1]), 64,
                 "morton")
    assert sorted(a.tolist()) == [0, 1, 2, 3]


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 32)).astype(np.float32)
    for mode, kw in [("linear", {}), ("tiled", dict(tile_n=2, tile_m=8)),
                     ("morton", {})]:
        buf = pack_image(img, mode, **kw)
        back = unpack_image(buf, 32, 16, mode, **kw)
        np.testing.assert_array_equal(back, img)


def test_tiled_2x8_matches_reference_formula():
    """ADDRESSING_TILED_2x8 (TiledAddress.glsl:67-73)."""
    W = 32
    for x, y in [(0, 0), (1, 0), (0, 1), (3, 9), (31, 15)]:
        surface_w = W >> 1
        tile_1d = ((x >> 1) + surface_w * (y // 8)) << 4
        pixel_1d = (x & 1) + (y & 7) * 2
        assert addr_gen(x, y, W, "tiled", 2, 8) == (tile_1d | pixel_1d)
