"""Tile layout utilities shared by all tile-grid kernels."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["unpack_tiles"]


def unpack_tiles(
    tiled: jnp.ndarray, tiles_x: int, tiles_y: int, tile_w: int, tile_h: int,
    width: int, height: int,
):
    """[n_tiles, P] or [n_tiles, tile_h, tile_w] -> [height, width]."""
    img = tiled.reshape(tiles_y, tiles_x, tile_h, tile_w)
    img = jnp.moveaxis(img, 2, 1).reshape(tiles_y * tile_h, tiles_x * tile_w)
    return img[:height, :width]
