"""Multi-chip image-space parallelism over a JAX device mesh.

The reference is a single-GPU app (SURVEY §2.10: no NCCL/MPI anywhere); its
parallel axes are per-fragment/per-ray GPU parallelism. The TPU-native
scaling design declared in SURVEY §2.10 is **image-space sharding**: each
chip rasterizes + shades a horizontal band of the frame under `shard_map`
over an ICI mesh; geometry (vertex transform) is replicated — it is tiny
compared to per-pixel work — and the final frame is formed by the sharded
output layout itself (no cross-chip fragment exchange is needed because
binning assigns triangles to every band they overlap).

Two more axes shard by RAYS / SEGMENTS with real collectives:
- `render_tubes_rtao_sharded`: every chip traces its own AO sample set
  (per-chip RNG fold) and the occlusion accumulator is `psum`-averaged
  (render/rtao.py psum_axis).
- `opacity_solve_sharded`: every chip gathers importance over one band of
  the half-res frame and the per-segment min/visibility reductions are
  cross-chip `pmin`/`pmax` (render/opacity_optimization.py band_axis).
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
from linevis_tpu.kernels.raster_pallas import build_csr_binning, rasterize_gbuffer_pallas
from linevis_tpu.kernels.tiles import unpack_tiles
from linevis_tpu.render.opaque import _GBUF_KEYS, _ray_basis_from_view_proj
from linevis_tpu.render.pipeline import (
    GBUFFER_PLANES,
    RasterSettings,
    build_payload,
    shade_gbuffer,
    tube_vertex_stage,
)

__all__ = [
    "make_device_mesh",
    "render_opaque_sharded",
    "render_tubes_mlab_sharded",
    "render_tubes_rtao_sharded",
    "opacity_solve_sharded",
]


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

    batch = tube_vertex_stage(
        mesh, view_proj, band_settings.width, band_h * n_bands
    )
    # Shift into band-local pixel coordinates; the band rasterizes rows
    # [0, band_h) of its own coordinate system.
    batch = dataclasses.replace(batch, tri_y=batch.tri_y - y_off)
    payload = build_payload(batch)
    csr = build_csr_binning(
        batch.tri_x, batch.tri_y, payload, batch.tri_valid,
        band_settings.width, band_h,
        band_settings.tile_w, band_settings.tile_h, band_settings.chunk,
        band_settings.span_x, band_settings.span_y,
        band_settings.pairs_capacity,
    )
    interpret = jax.default_backend() == "cpu"
    depth_t, id_t, attrs_t = rasterize_gbuffer_pallas(
        csr, GBUFFER_PLANES, band_settings.tile_w, band_settings.tile_h,
        interpret=interpret,
    )

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, band_settings.tile_w,
            band_settings.tile_h, band_settings.width, band_h,
        )

    gbuf = {"id": unp(id_t)}
    for key, buf in zip(_GBUF_KEYS, attrs_t):
        gbuf[key] = unp(buf)

    # Depth-cue range must be consistent across bands (collectives keep a
    # geometry-sharded variant correct too).
    dmin = jax.lax.pmin(batch.view_z_min, axis)
    dmax = jax.lax.pmax(batch.view_z_max, axis)

    # shade_gbuffer reconstructs positions from band-local pixel rows; use a
    # full-frame ray basis by shading with the band's v-coordinate range.
    ray_basis = _ray_basis_from_view_proj(view_proj)
    img = _shade_band(
        gbuf, tf_table, camera_position, ray_basis, dmin, dmax,
        band_settings, band, n_bands,
    )
    return img  # [4, band_h, W]


def _shade_band(gbuf, tf_table, camera_position, ray_basis, dmin, dmax,
                settings: RasterSettings, band, n_bands):
    """shade_gbuffer variant with v-coordinates offset to this band's rows."""
    from linevis_tpu.render.lighting import (
        apply_depth_cue,
        blinn_phong_shade_tube,
        normalize3,
    )

    H, W = gbuf["id"].shape
    full_h = H * n_bands
    fg = gbuf["id"] >= 0
    inv_w = jnp.maximum(gbuf["inv_w"], 1e-12)
    view_z = 1.0 / inv_w
    attr = gbuf["attr_w"] * view_z
    normal = normalize3(jnp.stack([gbuf["nx"], gbuf["ny"], gbuf["nz"]], axis=0))
    tangent = normalize3(jnp.stack([gbuf["tx"], gbuf["ty"], gbuf["tz"]], axis=0))

    u = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :] * (2.0 / W) - 1.0
    rows = band * H + jnp.arange(H, dtype=jnp.float32)
    v = 1.0 - (rows + 0.5)[:, None] * (2.0 / full_h)
    u = jnp.broadcast_to(u, (H, W))
    v = jnp.broadcast_to(v, (H, W))
    dirs = (
        ray_basis[:, 0][:, None, None] * u[None]
        + ray_basis[:, 1][:, None, None] * v[None]
        + ray_basis[:, 2][:, None, None]
    )
    pos = camera_position[:, None, None] + dirs * view_z[None]

    n = tf_table.shape[0]
    tt = tf_table.T
    f = jnp.clip(attr, 0.0, 1.0) * (n - 1)
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, n - 2)
    wgt = f - i0
    lut = [tt[c][i0] * (1.0 - wgt) + tt[c][i0 + 1] * wgt for c in range(4)]
    rgb = jnp.stack(lut[:3], axis=0)
    alpha = lut[3]

    color = blinn_phong_shade_tube(rgb, pos, normal, tangent, camera_position)
    if settings.depth_cue_strength > 0.0:
        color = apply_depth_cue(color, view_z, dmin, dmax,
                                settings.depth_cue_strength)
    bg = jnp.asarray(settings.background_color, jnp.float32)
    out_rgb = jnp.where(fg[None], color, bg[:3, None, None])
    out_a = jnp.where(fg, alpha, bg[3])
    return jnp.concatenate([out_rgb, out_a[None]], axis=0)


def render_opaque_sharded(
    mesh: TubeMesh,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    tf_table: jnp.ndarray,
    settings: RasterSettings,
    device_mesh: Mesh,
) -> jnp.ndarray:
    """Full-frame render sharded image-space over `device_mesh` -> [4, H, W].

    settings.height must divide evenly by n_devices * tile_h.
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


def render_tubes_mlab_sharded(
    scene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    device_mesh: Mesh,
    K: int = 8,
    opacity: float = 0.3,
) -> jnp.ndarray:
    """Transparent (MLAB) full-frame render sharded image-space: every
    chip bins + renders + composites its own horizontal band of the
    capsule scene (per-pixel OIT needs no cross-chip exchange).  The band
    window is folded into the kernel's ray basis
    (prepare_capsule_frame y_offset/full_height).
    """
    from linevis_tpu.kernels.raster_capsule_oit import rasterize_capsules_mlab
    from linevis_tpu.kernels.tiles import unpack_tiles as unpack_tiles_fn
    from linevis_tpu.render.tube_raster import prepare_capsule_frame

    axis = device_mesh.axis_names[0]
    n = device_mesh.devices.size
    assert settings.height % (n * settings.tile_h) == 0, (
        "height must be divisible by n_devices * tile_h"
    )
    H = settings.height
    band_settings = dataclasses.replace(settings, height=H // n)

    def band_body(scene, vp, cp, ab):
        band = jax.lax.axis_index(axis)
        band_h = band_settings.height
        y_off = (band * band_h).astype(jnp.float32)
        csr, params, _ = prepare_capsule_frame(
            scene, vp, cp, ab, band_settings,
            y_offset=y_off, full_height=H,
        )
        # Depth-cue range over the (replicated) scene — identical on all
        # bands, so no collective is needed.
        w_all = vp[3, :3] @ scene.a + vp[3, 3]
        big = jnp.float32(3e38)
        dmin = jnp.min(jnp.where(scene.mask, w_all, big))
        dmax = jnp.max(jnp.where(scene.mask, w_all, -big))
        params = params.at[11].set(dmin).at[12].set(dmax)
        params = params.at[13].set(band_settings.depth_cue_strength)
        params = params.at[14].set(opacity)
        interpret = jax.default_backend() == "cpu"
        depths, feat, alpha = rasterize_capsules_mlab(
            csr, params, band_settings.width, band_h,
            band_settings.tile_w, band_settings.tile_h, K,
            band_settings.tf_color, band_settings.tf_opacity,
            deferred_shade=True,
            interpret=interpret,
        )
        from linevis_tpu.render.oit import shade_deferred_nodes

        rgb = shade_deferred_nodes(
            depths, feat, alpha, ab, dmin, dmax,
            jnp.float32(band_settings.depth_cue_strength), band_settings,
        )
        T = jnp.ones_like(alpha[0])
        acc = jnp.zeros((3,) + alpha.shape[1:], jnp.float32)
        for i in range(depths.shape[0]):
            acc = acc + T[None] * rgb[:, i]
            T = T * (1.0 - alpha[i])
        bg = jnp.asarray(band_settings.background_color, jnp.float32)
        out = acc + T[None] * bg[:3, None, None]

        def unp(x):
            return unpack_tiles_fn(
                x, csr.tiles_x, csr.tiles_y, band_settings.tile_w,
                band_settings.tile_h, band_settings.width, band_h,
            )

        return jnp.stack(
            [unp(out[0]), unp(out[1]), unp(out[2]), unp(1.0 - T)], axis=0
        )

    shard_fn = jax.shard_map(
        band_body,
        mesh=device_mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    return shard_fn(scene, view_proj, camera_position, proj_ab)


def render_tubes_rtao_sharded(
    scene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    device_mesh: Mesh,
    rtao=None,
    grid=None,
) -> jnp.ndarray:
    """Ray-sharded RTAO: n chips x rtao.num_samples AO rays, accumulator
    psum-averaged across the mesh -> [4, H, W] (replicated).  The
    G-buffer raster is replicated per chip (cheap next to the rays)."""
    from linevis_tpu.kernels.ao_grid import build_segment_grid
    from linevis_tpu.render.rtao import RtaoSettings, render_tubes_rtao

    rtao = rtao or RtaoSettings()
    axis = device_mesh.axis_names[0]
    if grid is None:
        grid = build_segment_grid(
            scene.a, scene.ba, scene.radius, scene.mask,
            resolution=rtao.grid_resolution,
        )

    def body(scene, vp, cp, ab, grid):
        return render_tubes_rtao(
            scene, vp, cp, ab, settings, rtao, grid=grid, psum_axis=axis
        )

    shard_fn = jax.shard_map(
        body,
        mesh=device_mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return shard_fn(scene, view_proj, camera_position, proj_ab, grid)


def opacity_solve_sharded(
    scene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    prev_vertex_opacity: jnp.ndarray,
    settings: RasterSettings,
    oo,
    num_lines: int,
    pts_per_line: int,
    device_mesh: Mesh,
) -> jnp.ndarray:
    """Opacity-optimization steps 1-5 with the importance gather sharded
    image-space and the per-segment reductions as cross-chip pmin/pmax
    -> per-vertex opacities [L, P] (replicated; feed _final_render or
    render_tubes_mlab_sharded with the alpha rows)."""
    from linevis_tpu.render.opacity_optimization import _opacity_solve

    axis = device_mesh.axis_names[0]
    n = device_mesh.devices.size

    def body(scene, vp, cp, ab, prev):
        return _opacity_solve(
            scene, vp, cp, ab, prev, settings, oo, num_lines, pts_per_line,
            band_axis=axis, n_bands=n,
        )

    shard_fn = jax.shard_map(
        body,
        mesh=device_mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return shard_fn(
        scene, view_proj, camera_position, proj_ab, prev_vertex_opacity
    )


def render_vpt_sharded(
    key: jnp.ndarray,
    grid: jnp.ndarray,  # [Z, Y, X] density
    ray_origin: jnp.ndarray,
    ray_basis: jnp.ndarray,
    width: int,
    height: int,
    device_mesh: Mesh,
    settings=None,
    spp: int = 1,
) -> jnp.ndarray:
    """Sample-sharded volumetric path tracing: each chip traces its own
    `spp` jittered paths from a per-chip RNG fold and the radiance
    estimate is pmean-averaged across the mesh -> [H, W, 3] (replicated).
    The unbiased-estimator mean is invariant to the split, so n chips x
    spp equals one chip x n*spp in expectation (the property the
    reference's own VPT tests assert, TestVolumetricPathTracing.cpp:92).
    The dense grid is replicated: cloud grids are MBs next to HBM, and
    path incoherence makes grid-sharding all-to-all -- sample sharding
    rides ICI with ONE pmean per frame instead."""
    from linevis_tpu.render.vpt import VptSettings, render_vpt

    settings = settings or VptSettings()
    axis = device_mesh.axis_names[0]

    def body(key, grid, ro, rb):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        img = render_vpt(key, grid, ro, rb, width, height, settings,
                         spp=spp)
        return jax.lax.pmean(img, axis)

    shard_fn = jax.shard_map(
        body,
        mesh=device_mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return shard_fn(key, grid, ray_origin, ray_basis)
