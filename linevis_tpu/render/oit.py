"""Transparent line renderers (OIT family).

Reference: `src/Renderers/OIT/*` — PPLL, MLAB, MLABBucket, MBOIT, WBOIT,
depth peeling, depth complexity. The TPU-native design realizes the whole
family on one MLAB-K capsule kernel (`kernels/raster_capsule_oit.py`):

- `render_tubes_mlab(K=8)`      == reference MLAB (8 nodes default)
- `render_tubes_mlab(K=16/32)`  == reference PPLL for depth complexity <= K
  (exact sorted blending; beyond K, overflow merges like MLAB instead of
  growing an unbounded list — the bounded-memory redesign demanded by
  SURVEY §7 "hard parts")
- depth complexity / WBOIT are derived statistics of the same fragment
  stream (see render_depth_complexity).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.kernels.raster_capsule_oit import rasterize_capsules_mlab
from linevis_tpu.kernels.raster_xla import unpack_tiles
from linevis_tpu.kernels.trig_moment_math import (
    TRIG_BIAS,
    wrapping_zone_parameters,
)
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.transfer_function import TransferFunction
from linevis_tpu.render.tube_raster import (
    CapsuleScene,
    _proj_constants,
    prepare_capsule_frame,
)

__all__ = ["render_tubes_mlab", "render_tubes_mlab_image"]


def shade_deferred_nodes(depths, feat, alpha, proj_ab, dmin, dmax, cue,
                         settings, use_bands: bool = False):
    """Shade-after-extract resolve: the kernel's K nodes carry
    PREMULTIPLIED shading features (attr, cos1, cos2) — un-premultiply,
    apply the transfer function, the Phong cosine powers (the pow ops
    lower to exp/log on the VPU, so hoisting them here removes every
    transcendental from the kernel's per-candidate loop) and the depth
    cue once per extracted NODE (K*H*W work in XLA), then re-premultiply.
    Exact for un-merged nodes; the overflow-merged node K-1 shades the
    alpha-weighted average features (the merge itself is already an
    approximation).  feat: [3, K, T, P]; depths/alpha: [K, T, P]."""
    from linevis_tpu.render.transfer_function import tf_eval_points

    inv_a = jnp.where(alpha > 1e-6, 1.0 / jnp.maximum(alpha, 1e-6), 0.0)
    attr = feat[0] * inv_a
    cos1 = jnp.maximum(feat[1] * inv_a, 1e-20)
    cos2 = jnp.maximum(feat[2] * inv_a, 1e-20)
    e = 1.0 if use_bands else 1.7
    cosc = 0.3 * cos1 ** e + 0.7 * cos2 ** e
    spec = 0.3 * cos1 ** 30.0
    rgb, _ = tf_eval_points(settings.tf_color, settings.tf_opacity, attr)
    shade_f = 0.1 + 0.9 * cosc
    vz = proj_ab[1] / jnp.maximum(proj_ab[0] - depths, 1e-9)
    fcue = jnp.clip(
        (vz - dmin) / jnp.maximum(dmax - dmin, 1e-6), 0.0, 1.0
    )
    fcue = fcue * fcue * cue
    col = (rgb * shade_f[None] + spec[None]) * (1.0 - fcue[None]) \
        + 0.5 * fcue[None]
    return col * alpha[None]


@partial(jax.jit, static_argnames=("settings", "K", "opacity", "sub", "sat",
                                   "two_sided"))
def render_tubes_mlab(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    K: int = 8,
    opacity: float = 0.3,
    seg_alpha: jnp.ndarray = None,  # [2, S]: per-segment (alpha0, dalpha)
    sub: int = 32,  # kernel compute sub-chunk width
    sat: float = 0.999,  # saturation-culling threshold (see kernel doc)
    two_sided: bool = False,  # also blend exit-surface fragments
) -> jnp.ndarray:
    """Transparent tube render -> [4, H, W] linear RGBA.

    `seg_alpha` (e.g. from the stress hierarchy mapping curve,
    LineDataStress.get_segment_opacity_rows) multiplies the TF opacity
    per segment through the kernel's alpha rows.

    `two_sided=False` (default) blends front-face fragments only — the
    reference rasterizes transparent tubes with CULL_BACK
    (LineRasterPass.cpp:86-91). `two_sided=True` also blends the exit
    surfaces, which is what the reference's RAY TRACER composites (its
    re-cast loop has no backface culling, TubeRayTracing.glsl:61-82)."""
    if seg_alpha is not None:
        # The kernel's alpha rows REPLACE the TF alpha; premultiply the
        # global opacity so curves scale like the plain path.
        seg_alpha = seg_alpha * jnp.asarray([[opacity], [opacity]],
                                            jnp.float32)
    csr, params, basis = prepare_capsule_frame(
        scene, view_proj, camera_position, proj_ab, settings,
        seg_alpha=seg_alpha,
    )
    # Depth-cue range (consistent with the opaque path).
    w_all = view_proj[3, :3] @ scene.a + view_proj[3, 3]
    big = jnp.float32(3e38)
    dmin = jnp.min(jnp.where(scene.mask, w_all, big))
    dmax = jnp.max(jnp.where(scene.mask, w_all, -big))
    params = params.at[11].set(dmin).at[12].set(dmax)
    params = params.at[13].set(settings.depth_cue_strength)
    params = params.at[14].set(opacity)

    # Background for the kernel's in-kernel shade + composite.
    bg = settings.background_color
    params = (
        params.at[24].set(float(bg[0])).at[25].set(float(bg[1]))
        .at[26].set(float(bg[2])).at[27].set(float(bg[3]))
    )
    interpret = jax.default_backend() == "cpu"
    rgba = rasterize_capsules_mlab(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, K,
        settings.tf_color, settings.tf_opacity,
        alpha_from_rows=seg_alpha is not None,
        deferred_shade=True,
        sub=sub,
        sat=sat,
        composite=True,
        two_sided=two_sided,
        interpret=interpret,
    )

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
            settings.width, settings.height,
        )

    img = jnp.stack([unp(rgba[c]) for c in range(4)], axis=0)
    return img


def render_tubes_mlab_image(
    scene: CapsuleScene,
    camera: Camera,
    tf: Optional[TransferFunction] = None,
    settings: Optional[RasterSettings] = None,
    K: int = 8,
    opacity: float = 0.3,
) -> np.ndarray:
    settings = settings or RasterSettings(width=camera.width, height=camera.height)
    if tf is not None:
        c_pts, o_pts = tf.as_static_points()
        settings = dataclasses.replace(settings, tf_color=c_pts, tf_opacity=o_pts)
    img = render_tubes_mlab(
        scene,
        jnp.asarray(camera.view_projection_matrix()),
        jnp.asarray(np.asarray(camera.position, np.float32)),
        jnp.asarray(_proj_constants(camera)),
        settings,
        K,
        opacity,
    )
    return np.moveaxis(np.asarray(img), 0, -1)


@partial(jax.jit, static_argnames=("settings", "opacity"))
def render_tubes_wboit(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    opacity: float = 0.3,
) -> jnp.ndarray:
    """Weighted-blended OIT (reference WBOITRenderer.cpp:195): accumulation
    + revealage targets with the depth-based weight of WBOITGather.glsl."""
    csr, params, basis = prepare_capsule_frame(
        scene, view_proj, camera_position, proj_ab, settings
    )
    params = params.at[14].set(opacity)
    interpret = jax.default_backend() == "cpu"
    depths, rgb, alpha = rasterize_capsules_mlab(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, 1,
        settings.tf_color, settings.tf_opacity,
        store_mode="wboit", interpret=interpret,
    )
    log_t = depths[0]
    revealage = jnp.exp(log_t)
    sum_wa = jnp.maximum(alpha[0], 1e-6)
    acc = rgb[:, 0] / sum_wa[None]
    bg = jnp.asarray(settings.background_color, jnp.float32)
    out = acc * (1.0 - revealage)[None] + revealage[None] * bg[:3, None, None]

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
            settings.width, settings.height,
        )

    return jnp.stack(
        [unp(out[0]), unp(out[1]), unp(out[2]), unp(1.0 - revealage)], axis=0
    )


@partial(jax.jit, static_argnames=("settings", "K", "opacity"))
def render_tubes_atomic_loop(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    K: int = 16,
    opacity: float = 0.3,
) -> jnp.ndarray:
    """Atomic Loop 64 (reference AtomicLoop64Renderer.cpp:283): a K-deep
    per-pixel buffer of packed (depth<<32 | color) entries maintained by a
    64-bit atomicMin insertion loop — the steady state is exactly the K
    nearest fragments in depth order, fragments beyond K are dropped.

    The TPU kernel computes that steady state directly: an exact front-K
    extraction with `no_overflow=True` (no MLAB merge), blended
    front-to-back.  Identical output, no atomics needed — per-pixel
    ordering is a sorting network in registers instead of memory traffic.
    """
    csr, params, _ = prepare_capsule_frame(
        scene, view_proj, camera_position, proj_ab, settings
    )
    params = _mlab_params(scene, view_proj, params, settings, opacity)
    interpret = jax.default_backend() == "cpu"
    depths, rgb, alpha = rasterize_capsules_mlab(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, K,
        settings.tf_color, settings.tf_opacity,
        no_overflow=True, interpret=interpret,
    )
    T = jnp.ones_like(alpha[0])
    acc = jnp.zeros((3,) + alpha.shape[1:], jnp.float32)
    for i in range(K):
        acc = acc + T[None] * rgb[:, i]
        T = T * (1.0 - alpha[i])
    bg = jnp.asarray(settings.background_color, jnp.float32)
    out = acc + T[None] * bg[:3, None, None]

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
            settings.width, settings.height,
        )

    return jnp.stack([unp(out[0]), unp(out[1]), unp(out[2]), unp(1.0 - T)], 0)


def _mlab_params(scene, view_proj, params, settings, opacity):
    """Fill depth-cue + opacity slots shared by the transparent passes."""
    w_all = view_proj[3, :3] @ scene.a + view_proj[3, 3]
    big = jnp.float32(3e38)
    dmin = jnp.min(jnp.where(scene.mask, w_all, big))
    dmax = jnp.max(jnp.where(scene.mask, w_all, -big))
    params = params.at[11].set(dmin).at[12].set(dmax)
    params = params.at[13].set(settings.depth_cue_strength)
    params = params.at[14].set(opacity)
    return params


@partial(jax.jit, static_argnames=("settings", "K", "passes", "opacity"))
def render_tubes_depth_peeling(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    K: int = 8,
    passes: int = 4,
    opacity: float = 0.3,
) -> jnp.ndarray:
    """Depth peeling (reference DepthPeelingRenderer.cpp:423).

    Each pass extracts the next K nearest layers EXACTLY (no overflow
    merge) beyond the previous pass's per-pixel peel depth — K layers per
    pass instead of the reference's one, so `passes*K` total exact layers.
    """
    csr, params, _ = prepare_capsule_frame(
        scene, view_proj, camera_position, proj_ab, settings
    )
    params = _mlab_params(scene, view_proj, params, settings, opacity)
    interpret = jax.default_backend() == "cpu"
    n_tiles = csr.tile_start.shape[0]
    P = settings.tile_w * settings.tile_h
    peel = jnp.full((n_tiles, P), -1.0, jnp.float32)
    T = jnp.ones((n_tiles, P), jnp.float32)
    acc = jnp.zeros((3, n_tiles, P), jnp.float32)
    for _ in range(passes):
        depths, rgb, alpha = rasterize_capsules_mlab(
            csr, params, settings.width, settings.height,
            settings.tile_w, settings.tile_h, K,
            settings.tf_color, settings.tf_opacity,
            peel=peel, no_overflow=True, interpret=interpret,
        )
        for i in range(K):
            acc = acc + T[None] * rgb[:, i]
            T = T * (1.0 - alpha[i])
        # Next peel depth: farthest extracted layer (2.0 marks empty).
        # Monotone: an empty pass must not reset the threshold, else the
        # following pass re-extracts (and re-blends) earlier layers.
        peel = jnp.maximum(
            peel, jnp.max(jnp.where(depths < 1.5, depths, -1.0), axis=0)
        )

    bg = jnp.asarray(settings.background_color, jnp.float32)
    out = acc + T[None] * bg[:3, None, None]

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
            settings.width, settings.height,
        )

    return jnp.stack([unp(out[0]), unp(out[1]), unp(out[2]), unp(1.0 - T)], 0)


@partial(jax.jit, static_argnames=("settings", "K", "opacity"))
def render_tubes_mlab_buckets(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    K: int = 8,
    opacity: float = 0.3,
) -> jnp.ndarray:
    """MLAB (Buckets) — reference MLABBucketRenderer: the nearest bucket of
    fragments is kept exact, the far bucket degrades to MLAB overflow
    merging.  Realized as one exact peel pass (K nearest layers, no merge)
    followed by one MLAB pass over the remaining fragments.
    """
    csr, params, _ = prepare_capsule_frame(
        scene, view_proj, camera_position, proj_ab, settings
    )
    params = _mlab_params(scene, view_proj, params, settings, opacity)
    interpret = jax.default_backend() == "cpu"
    n_tiles = csr.tile_start.shape[0]
    P = settings.tile_w * settings.tile_h
    peel = jnp.full((n_tiles, P), -1.0, jnp.float32)
    T = jnp.ones((n_tiles, P), jnp.float32)
    acc = jnp.zeros((3, n_tiles, P), jnp.float32)
    # Bucket 0: exact nearest-K extraction.
    depths, rgb, alpha = rasterize_capsules_mlab(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, K,
        settings.tf_color, settings.tf_opacity,
        peel=peel, no_overflow=True, interpret=interpret,
    )
    for i in range(K):
        acc = acc + T[None] * rgb[:, i]
        T = T * (1.0 - alpha[i])
    peel = jnp.max(jnp.where(depths < 1.5, depths, -1.0), axis=0)
    # Bucket 1: remaining fragments with MLAB overflow merge.
    _, rgb2, alpha2 = rasterize_capsules_mlab(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, K,
        settings.tf_color, settings.tf_opacity,
        peel=peel, interpret=interpret,
    )
    for i in range(K):
        acc = acc + T[None] * rgb2[:, i]
        T = T * (1.0 - alpha2[i])

    bg = jnp.asarray(settings.background_color, jnp.float32)
    out = acc + T[None] * bg[:3, None, None]

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
            settings.width, settings.height,
        )

    return jnp.stack([unp(out[0]), unp(out[1]), unp(out[2]), unp(1.0 - T)], 0)


@partial(
    jax.jit,
    static_argnames=("settings", "n_mom", "opacity", "overestimation",
                     "moment_bias", "trigonometric", "pixel_format"),
)
def render_tubes_mboit(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    n_mom: int = 4,
    opacity: float = 0.3,
    overestimation: float = 0.1,
    moment_bias: float = None,
    trigonometric: bool = False,
    pixel_format: str = "float32",  # | "unorm16"
) -> jnp.ndarray:
    """Moment-based OIT (reference MBOITRenderer.cpp:688, single
    precision).  Two fragment passes over the same binning: pass 1
    accumulates absorbance moments, pass 2 reconstructs per-fragment
    transmittance and accumulates weighted color; the blend follows
    MBOITBlend.glsl:100-101.  `trigonometric` selects the reference's
    `usePowerMoments = false` mode (complex circle-point moments,
    TrigonometricMomentMath.glsl) with n_mom/2 complex moments.
    """
    from linevis_tpu.kernels.moment_math import (
        UNORM_BIAS_VECTOR,
        UNORM_MOMENT_BIAS,
        UNORM_MOMENT_BIAS_TRIG,
        dequantize_moments_unorm16,
        quantize_moments_unorm16,
    )

    unorm = pixel_format == "unorm16"
    if pixel_format not in ("float32", "unorm16"):
        raise ValueError(f"pixel_format {pixel_format!r}")
    if moment_bias is None:
        # Per-format defaults (MBOITRenderer.cpp:134-161).
        if trigonometric:
            moment_bias = (UNORM_MOMENT_BIAS_TRIG[n_mom] if unorm
                           else TRIG_BIAS[n_mom])
        else:
            moment_bias = (UNORM_MOMENT_BIAS[n_mom] if unorm
                           else {4: 5e-7, 6: 5e-6, 8: 5e-5}[n_mom])
    csr, params, basis = prepare_capsule_frame(
        scene, view_proj, camera_position, proj_ab, settings
    )
    # Log depth range over the scene AABB in view space with the reference's
    # 0.1 offset (MBOITRenderer::computeDepthRange).
    w_all = view_proj[3, :3] @ scene.a + view_proj[3, 3]
    big = jnp.float32(3e38)
    near = proj_ab[1] / jnp.maximum(proj_ab[0], 1e-9)
    dmin = jnp.min(jnp.where(scene.mask, w_all, big))
    dmax = jnp.max(jnp.where(scene.mask, w_all, -big))
    zmin = jnp.maximum(dmin - scene.radius - 0.1, near)
    zmax = jnp.maximum(dmax + scene.radius + 0.1, near * 2.0)
    params = params.at[11].set(dmin).at[12].set(dmax)
    params = params.at[13].set(settings.depth_cue_strength)
    params = params.at[14].set(opacity)
    params = params.at[15].set(jnp.log(zmin)).at[16].set(jnp.log(zmax))
    # UNORM16: biasing moves out of the kernel (pre-mixed below with the
    # UNORM bias vectors, which differ from the in-kernel FLOAT_32 ones).
    kernel_bias = 0.0 if unorm else moment_bias
    params = params.at[17].set(kernel_bias).at[18].set(overestimation)
    if trigonometric:
        wzp = wrapping_zone_parameters()
        params = params.at[20].set(wzp[1]).at[21].set(wzp[2])
        params = params.at[22].set(wzp[3])

    interpret = jax.default_backend() == "cpu"
    depths, rgb, alpha = rasterize_capsules_mlab(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, 2,
        settings.tf_color, settings.tf_opacity,
        store_mode="mboit_gen", n_mom=n_mom, trig=trigonometric,
        interpret=interpret,
    )
    b0 = depths[0]
    odd_ch = (rgb[0, 0], rgb[1, 0], rgb[2, 0], alpha[0])[: n_mom // 2]
    even_ch = (depths[1], rgb[0, 1], rgb[1, 1], rgb[2, 1])[: n_mom // 2]
    if unorm:
        # Emulate rgba16-unorm moment storage between the passes: the
        # normalized moments go through the reference's quantization
        # basis change into [0, 1], get rounded to the 65535-step grid,
        # and come back through the inverse (MomentMath.glsl:156-243).
        # Biasing is pre-mixed here (bias vectors MomentOIT.glsl:459,
        # 514,552) and the kernel sees bias 0.
        inv_b0 = 1.0 / jnp.maximum(b0, 1e-6)
        on = [o * inv_b0 for o in odd_ch]
        en = [e * inv_b0 for e in even_ch]
        if trigonometric:
            oq = [0.5 * x + 0.5 for x in on]
            eq = [0.5 * x + 0.5 for x in en]
        else:
            oq, eq = quantize_moments_unorm16(on, en, n_mom)

        def u16(x):
            return jnp.round(jnp.clip(x, 0.0, 1.0) * 65535.0) / 65535.0

        oq = [u16(x) for x in oq]
        eq = [u16(x) for x in eq]
        if trigonometric:
            scale = 1.0 - moment_bias
            od = [(2.0 * x - 1.0) * scale for x in oq]
            ed = [(2.0 * x - 1.0) * scale for x in eq]
        else:
            od, ed = dequantize_moments_unorm16(oq, eq, n_mom)
            bv = UNORM_BIAS_VECTOR[n_mom]
            od = [(1.0 - moment_bias) * x + moment_bias * bv[2 * j]
                  for j, x in enumerate(od)]
            ed = [(1.0 - moment_bias) * x + moment_bias * bv[2 * j + 1]
                  for j, x in enumerate(ed)]
        odd_ch = tuple(x * b0 for x in od)
        even_ch = tuple(x * b0 for x in ed)
    moments = jnp.stack([b0, *odd_ch, *even_ch], axis=0)

    _, rgb2, alpha2 = rasterize_capsules_mlab(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, 1,
        settings.tf_color, settings.tf_opacity,
        store_mode="mboit_resolve", n_mom=n_mom, trig=trigonometric,
        moments=moments, interpret=interpret,
    )
    accum_rgb = rgb2[:, 0]
    accum_a = jnp.maximum(alpha2[0], 1e-6)
    total_t = jnp.exp(-b0)
    src_a = 1.0 - total_t
    bg = jnp.asarray(settings.background_color, jnp.float32)
    out = (accum_rgb / accum_a[None]) * src_a[None] + (
        total_t[None] * bg[:3, None, None]
    )

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
            settings.width, settings.height,
        )

    return jnp.stack([unp(out[0]), unp(out[1]), unp(out[2]), unp(src_a)], 0)


@partial(jax.jit, static_argnames=("settings",))
def render_depth_complexity(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
) -> jnp.ndarray:
    """Fragment count per pixel (reference DepthComplexityRenderer.cpp:346).

    Returns [H, W] float32 counts. Front-face fragments only, matching the
    reference's CULL_BACK transparent raster (LineRasterPass.cpp:86-91) —
    one fragment per capsule crossing, not entry+exit.
    """
    csr, params, _ = prepare_capsule_frame(
        scene, view_proj, camera_position, proj_ab, settings
    )
    interpret = jax.default_backend() == "cpu"
    depths, _rgb, _alpha = rasterize_capsules_mlab(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, 1,
        settings.tf_color, settings.tf_opacity,
        store_mode="count", interpret=interpret,
    )
    return unpack_tiles(
        depths[0], csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
        settings.width, settings.height,
    )
