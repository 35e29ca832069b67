"""Ray-traced ambient occlusion renderer.

Reference: `src/Renderers/AmbientOcclusion/VulkanRayTracedAmbientOcclusion.*`
(per-frame cosine-hemisphere occlusion rays from the visible surface with
frame accumulation; defaults 4 samples/frame, reference
`VulkanAmbientOcclusionBaker.hpp:163-166`) combined with the ray-traced
tube rendering of `src/Renderers/RayTracing/VulkanRayTracer.*` (the
primary visibility here comes from the binned-capsule raster, which IS an
exact per-pixel ray-capsule intersection). AO shading modulation follows
`Lighting.glsl` (kA = 0.2 + (1-ao)*0.5, kD = 0.9*ao, color *= ao).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.kernels.ao_grid import build_segment_grid, trace_ao_occlusion
from linevis_tpu.kernels.raster_capsule import rasterize_capsules_pallas
from linevis_tpu.kernels.tiles import unpack_tiles
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.lighting import normalize3
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.transfer_function import TransferFunction, tf_eval_points
from linevis_tpu.render.tube_raster import (
    CapsuleScene,
    _proj_constants,
    prepare_capsule_frame,
)

__all__ = ["render_tubes_rtao", "render_tubes_rtao_image", "RtaoSettings"]


@dataclasses.dataclass(frozen=True)
class RtaoSettings:
    num_samples: int = 4  # AO rays per pixel per frame (reference default 4)
    ao_radius: float = 0.1  # occlusion distance in world units
    grid_resolution: int = 64
    max_ray_cells: int = 8  # cells sampled along each AO ray
    seed: int = 0
    # AO denoiser chain (reference VulkanRayTracedAmbientOcclusion.cpp
    # optional denoiser + Denoiser.hpp:62-99): "None" | "Spatial Hashing"
    # | "EAW".
    denoiser: str = "None"
    # Rays traced per batch. The (cell, ray) pair expansion materializes
    # max_ray_cells records per ray through a sort; at 1080p x 4 spp that
    # is 66M pairs — beyond the compiler's memory budget in one shot.
    # Batches of ~2M rays keep the working set at the proven 960x540
    # scale while lax.map reuses one compiled trace. 0 = single batch.
    rays_per_batch: int = 2_100_000


def _cosine_hemisphere(key, normal, num_samples):
    """Cosine-weighted directions around `normal` [3, H, W] ->
    [S, 3, H, W]."""
    shape = (num_samples,) + normal.shape[1:]
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape)
    u2 = jax.random.uniform(k2, shape)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    # Build an orthonormal basis around the normal (branchless Frisvad).
    n = normal
    sign = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[2])
    b = n[0] * n[1] * a
    t1 = jnp.stack([1.0 + sign * n[0] * n[0] * a, sign * b, -sign * n[0]], 0)
    t2 = jnp.stack([b, sign + n[1] * n[1] * a, -n[1]], 0)
    d = (
        t1[None] * x[:, None]
        + t2[None] * y[:, None]
        + n[None] * z[:, None]
    )
    return d  # [S, 3, H, W]


@partial(
    jax.jit,
    static_argnames=("settings", "rtao", "frame", "return_features",
                     "psum_axis"),
)
def render_tubes_rtao(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    rtao: RtaoSettings = RtaoSettings(),
    frame: int = 0,
    grid=None,  # prebuilt SegmentGrid (camera-independent; hoist per scene)
    return_features: bool = False,
    psum_axis: str = None,  # inside shard_map: psum the AO accumulator
) -> jnp.ndarray:
    """RTAO-shaded tubes -> [4, H, W] linear RGBA.

    With `return_features`, also returns (position [3, H, W],
    normal [3, H, W], foreground [H, W]) — the G-buffer feature maps the
    temporal SVGF denoiser consumes (motion vectors derive from position
    + the previous view-projection, render/deferred.motion_vectors).

    With `psum_axis` (called under shard_map / a named mesh axis), each
    chip traces its own `num_samples` AO rays from a per-chip RNG fold
    and the occlusion accumulator is `psum`-averaged across the axis —
    ray-sharded multi-chip RTAO (parallel/mesh.render_tubes_rtao_sharded);
    the G-buffer raster is replicated (it is cheap next to the rays)."""
    interpret = jax.default_backend() == "cpu"
    W, H = settings.width, settings.height

    # 1) Primary visibility via the binned-capsule raster (exact ray hits).
    csr, params, basis = prepare_capsule_frame(
        scene, view_proj, camera_position, proj_ab, settings
    )
    # use_aa=False: the AO G-buffer wants solid geometric hits only —
    # sub-half-pixel edge fragments would spawn AO rays from silhouette
    # grazing points.
    depth_t, id_t, gbuf_t = rasterize_capsules_pallas(
        csr, params, W, H, settings.tile_w, settings.tile_h,
        interpret=interpret, use_aa=False,
    )

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
            W, H,
        )

    zndc = unp(depth_t)
    seg_id = unp(id_t)
    attr, nx, ny, nz, tx, ty, tz, _cov = (unp(b) for b in gbuf_t)
    fg = seg_id >= 0
    normal = normalize3(jnp.stack([nx, ny, nz], axis=0))
    tangent = normalize3(jnp.stack([tx, ty, tz], axis=0))

    # Reconstruct surface positions from the depth buffer.
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :] * (2.0 / W) - 1.0
    v = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None] * (2.0 / H)
    d = (
        basis[:, 0][:, None, None] * jnp.broadcast_to(u, (H, W))[None]
        + basis[:, 1][:, None, None] * jnp.broadcast_to(v, (H, W))[None]
        + basis[:, 2][:, None, None]
    )
    view_z = proj_ab[1] / jnp.maximum(proj_ab[0] - zndc, 1e-9)
    pos = camera_position[:, None, None] + d * view_z[None]

    # 2) AO rays + grid trace.
    if grid is None:
        grid = build_segment_grid(
            scene.a, scene.ba, scene.radius, scene.mask,
            resolution=rtao.grid_resolution,
        )
    key = jax.random.PRNGKey(rtao.seed + frame)
    if psum_axis is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(psum_axis))
    dirs = _cosine_hemisphere(key, normal, rtao.num_samples)  # [S, 3, H, W]
    Srays = rtao.num_samples
    eps = 2.0 * scene.radius
    origins = pos[None] + normal[None] * eps  # offset to avoid self-hits
    o_flat = jnp.broadcast_to(origins, (Srays, 3, H, W)).transpose(
        1, 0, 2, 3
    ).reshape(3, -1)
    d_flat = dirs.transpose(1, 0, 2, 3).reshape(3, -1)
    n_rays = Srays * H * W
    t_max = jnp.full((n_rays,), rtao.ao_radius, jnp.float32)
    valid = jnp.broadcast_to(fg[None], (Srays, H, W)).reshape(-1)
    rpb = rtao.rays_per_batch
    if rpb and n_rays > rpb:
        # Batch the trace: the pair expansion + cell sort materialize
        # max_ray_cells records per ray, so one 1080p x 4spp shot (66M
        # pairs) blows the compiler memory budget. lax.map compiles ONE
        # batch trace and streams the batches through it sequentially —
        # peak memory is one batch's expansion.
        n_b = -(-n_rays // rpb)
        per = -(-n_rays // n_b)
        per = -(-per // 128) * 128  # chunk-aligned batch width
        pad = n_b * per - n_rays
        o_b = jnp.pad(o_flat, ((0, 0), (0, pad))).reshape(3, n_b, per)
        d_b = jnp.pad(d_flat, ((0, 0), (0, pad))).reshape(3, n_b, per)
        t_b = jnp.pad(t_max, (0, pad)).reshape(n_b, per)
        v_b = jnp.pad(valid, (0, pad)).reshape(n_b, per)

        def one_batch(args):
            ob, db, tb, vb = args
            return trace_ao_occlusion(
                ob, db, tb, vb, grid,
                max_ray_cells=rtao.max_ray_cells, interpret=interpret,
            )

        occ_b = jax.lax.map(
            one_batch,
            (o_b.transpose(1, 0, 2), d_b.transpose(1, 0, 2), t_b, v_b),
        )
        occluded = occ_b.reshape(-1)[:n_rays]
    else:
        occluded = trace_ao_occlusion(
            o_flat, d_flat, t_max, valid, grid,
            max_ray_cells=rtao.max_ray_cells, interpret=interpret,
        )
    occ_mean = occluded.reshape(Srays, H, W).mean(axis=0)
    if psum_axis is not None:
        # Sample-accumulator reduction over the device mesh: n chips x
        # num_samples rays average into one AO estimate.
        occ_mean = jax.lax.pmean(occ_mean, psum_axis)
    ao = 1.0 - occ_mean  # [H, W]

    if rtao.denoiser == "Spatial Hashing":
        # World-space hash-cell averaging of the noisy AO (the
        # SpatialHashingDenoiser is the reference's AO-specific choice).
        from linevis_tpu.render.denoiser import spatial_hash_denoise

        den = spatial_hash_denoise(ao, pos, normal, camera_position)
        ao = jnp.where(fg, den, ao)
    elif rtao.denoiser == "EAW":
        from linevis_tpu.render.denoiser import eaw_denoise

        den = eaw_denoise(ao[None], position=pos, normal=normal)[0]
        ao = jnp.where(fg, den, ao)

    # 3) Shade with AO modulation (Lighting.glsl AO variant).
    dn = d * jax.lax.rsqrt(jnp.sum(d * d, axis=0, keepdims=True))
    light = -dn
    ndl = jnp.sum(normal * light, axis=0)
    tdl = jnp.sum(tangent * light, axis=0)
    ndt = jnp.sum(normal * tangent, axis=0)
    denom = jax.lax.rsqrt(jnp.maximum(1.0 - tdl * tdl, 1e-6))
    cos1 = jnp.clip(jnp.abs(ndl), 0.0, 1.0)
    cos2 = jnp.clip(jnp.abs(ndl - tdl * ndt) * denom, 0.0, 1.0)
    cosc = 0.3 * cos1**1.7 + 0.7 * cos2**1.7
    spec = 0.3 * cos1**30.0
    rgb, alpha = tf_eval_points(settings.tf_color, settings.tf_opacity, attr)
    k_a = 0.2 + (1.0 - ao) * 0.5
    k_d = 0.9 * ao
    color = rgb * k_a[None] + rgb * (k_d * cosc)[None] + (spec * ao)[None]
    color = color * ao[None]

    bg = jnp.asarray(settings.background_color, jnp.float32)
    out_rgb = jnp.where(fg[None], color, bg[:3, None, None])
    out_a = jnp.where(fg, alpha, bg[3])
    img = jnp.concatenate([out_rgb, out_a[None]], axis=0)
    if return_features:
        return img, (pos, normal, fg)
    return img


def render_tubes_rtao_image(
    scene: CapsuleScene,
    camera: Camera,
    tf: Optional[TransferFunction] = None,
    settings: Optional[RasterSettings] = None,
    rtao: RtaoSettings = RtaoSettings(),
    accumulate_frames: int = 1,
) -> np.ndarray:
    """Host wrapper with frame accumulation (reference <=32 frames)."""
    settings = settings or RasterSettings(width=camera.width, height=camera.height)
    if tf is not None:
        c_pts, o_pts = tf.as_static_points()
        settings = dataclasses.replace(settings, tf_color=c_pts, tf_opacity=o_pts)
    vp = jnp.asarray(camera.view_projection_matrix())
    cp = jnp.asarray(np.asarray(camera.position, np.float32))
    ab = jnp.asarray(_proj_constants(camera))
    grid = build_segment_grid(
        scene.a, scene.ba, scene.radius, scene.mask,
        resolution=rtao.grid_resolution,
    )
    acc = None
    for f in range(accumulate_frames):
        img = render_tubes_rtao(scene, vp, cp, ab, settings, rtao, frame=f,
                                grid=grid)
        acc = img if acc is None else acc + img
    return np.moveaxis(np.asarray(acc / accumulate_frames), 0, -1)
