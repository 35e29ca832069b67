"""Multi-chip image-space parallelism over a JAX device mesh.

The reference is a single-GPU app (SURVEY §2.10: no NCCL/MPI anywhere); its
parallel axes are per-fragment/per-ray GPU parallelism. The TPU-native
scaling design declared in SURVEY §2.10 is **image-space sharding**: each
chip rasterizes + shades a horizontal band of the frame under `shard_map`
over an ICI mesh; geometry (vertex transform) is replicated — it is tiny
compared to per-pixel work — and the final frame is formed by the sharded
output layout itself (no cross-chip fragment exchange is needed because
binning assigns triangles to every band they overlap).

RTAO / path tracing shard the same way over rays with a `psum` over sample
accumulators; opacity optimization reduces per-segment importance with a
`psum` (see render/opacity_optimization.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from linevis_tpu.geometry.tubes import TubeMesh
from linevis_tpu.render.pipeline import RasterSettings, deferred_shade, vertex_stage
from linevis_tpu.render.opaque import build_raster_payload
from linevis_tpu.kernels.raster_pallas import build_csr_binning, rasterize_depth_pallas
from linevis_tpu.kernels.raster_xla import unpack_tiles

__all__ = ["make_device_mesh", "render_opaque_sharded"]


def make_device_mesh(n_devices: Optional[int] = None, axis: str = "y") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _render_band(mesh: TubeMesh, view_proj, camera_position, tf_table,
                 band_settings: RasterSettings, n_bands: int, axis: str):
    """Body run per device: render this device's horizontal band."""
    band = jax.lax.axis_index(axis)
    band_h = band_settings.height
    y_off = (band * band_h).astype(jnp.float32)

    vs = vertex_stage(
        mesh.vertices, mesh.triangles, mesh.triangle_mask, view_proj,
        band_settings.width, band_h * n_bands,
    )
    # Shift into band-local pixel coordinates; the band rasterizes rows
    # [0, band_h) of its own coordinate system.
    vs = dataclasses.replace(
        vs, sy=vs.sy - y_off, tri_y=vs.tri_y - y_off,
    )
    payload = build_raster_payload(vs)
    csr = build_csr_binning(
        vs.tri_x, vs.tri_y, payload, vs.tri_valid,
        band_settings.width, band_h,
        band_settings.tile_w, band_settings.tile_h, band_settings.chunk,
        band_settings.span_x, band_settings.span_y,
        band_settings.pairs_capacity,
    )
    interpret = jax.default_backend() == "cpu"
    depth_t, id_t = rasterize_depth_pallas(
        csr, band_settings.tile_w, band_settings.tile_h, interpret=interpret
    )
    tri_id = unpack_tiles(
        id_t, csr.tiles_x, csr.tiles_y, band_settings.tile_w,
        band_settings.tile_h, band_settings.width, band_h,
    )
    big = jnp.float32(3e38)
    # Depth-cue range must be consistent across bands -> psum-style global
    # min/max over the mesh (replicated compute, but written with collectives
    # so a geometry-sharded variant stays correct).
    dmin = jnp.min(jnp.where(mesh.vertex_mask, vs.view_z, big))
    dmax = jnp.max(jnp.where(mesh.vertex_mask, vs.view_z, -big))
    dmin = jax.lax.pmin(dmin, axis)
    dmax = jax.lax.pmax(dmax, axis)
    img = deferred_shade(
        tri_id, mesh, vs, tf_table, camera_position, dmin, dmax, band_settings
    )
    return img  # [4, band_h, W]


def render_opaque_sharded(
    mesh: TubeMesh,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    tf_table: jnp.ndarray,
    settings: RasterSettings,
    device_mesh: Mesh,
) -> jnp.ndarray:
    """Full-frame render sharded image-space over `device_mesh` -> [4, H, W].

    settings.height must divide evenly by the mesh size (band height must be
    a multiple of the tile height).
    """
    axis = device_mesh.axis_names[0]
    n = device_mesh.devices.size
    assert settings.height % (n * settings.tile_h) == 0, (
        "height must be divisible by n_devices * tile_h"
    )
    band_settings = dataclasses.replace(settings, height=settings.height // n)

    shard_fn = jax.shard_map(
        partial(
            _render_band,
            band_settings=band_settings, n_bands=n, axis=axis,
        ),
        mesh=device_mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    return shard_fn(mesh, view_proj, camera_position, tf_table)
