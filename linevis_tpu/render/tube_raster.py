"""Primary tube renderer: screen-binned analytic capsule rasterization.

Replaces the reference's gather raster pass over triangulated tubes
(`src/Renderers/OpaqueLineRenderer.cpp` + geometry of
`src/Renderers/Tubes/Tubes.hpp:40`) with pixel-exact capsules — the
reference's own linear-swept-sphere RT geometry
(`VulkanRayTracer.hpp:53-63`) driven by tile binning. See
`kernels/raster_capsule.py` for the TPU rationale.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.kernels.raster_capsule import rasterize_capsules_pallas
from linevis_tpu.kernels.raster_pallas import build_sorted_binning
from linevis_tpu.kernels.tiles import unpack_tiles
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.lighting import (
    apply_depth_cue,
    blinn_phong_shade_tube,
    normalize3,
)
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.transfer_function import TransferFunction

__all__ = [
    "CapsuleScene", "build_capsule_scene", "render_tubes",
    "render_tubes_image", "PrismScene", "build_prism_scene",
    "render_tubes_prism", "render_tubes_prism_image",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["a", "ba", "attr0", "dattr", "mask", "cap_a"],
    meta_fields=["radius"],
)
@dataclasses.dataclass
class CapsuleScene:
    """Per-segment SoA for the capsule renderer (channels-first).

    a:     [3, S] segment start points
    ba:    [3, S] segment vectors (b - a)
    attr0: [S] attribute at a;  dattr: [S] attr(b) - attr(a)
    mask:  [S] valid segments
    cap_a: [S] 1.0 where the start cap renders (chain starts only: interior
           joint spheres are drawn once, by the PREVIOUS segment's b-cap, so
           transparent chains blend each joint exactly once)
    radius: float — tube radius (line width / 2, reference
            `STANDARD_LINE_WIDTH` semantics)
    """

    a: jnp.ndarray
    ba: jnp.ndarray
    attr0: jnp.ndarray
    dattr: jnp.ndarray
    mask: jnp.ndarray
    cap_a: jnp.ndarray
    radius: float

    @property
    def num_segments(self) -> int:
        return int(self.a.shape[1])


def build_capsule_scene(positions, mask, attrs, radius: float) -> CapsuleScene:
    """positions [L, P, 3], mask [L, P], attrs [L, P] -> CapsuleScene."""
    pos = jnp.asarray(positions)
    L, P = pos.shape[0], pos.shape[1]
    cf = pos.reshape(L * P, 3).T.reshape(3, L, P)
    a = cf[:, :, :-1].reshape(3, -1)
    b = cf[:, :, 1:].reshape(3, -1)
    m = jnp.asarray(mask)
    seg_mask = (m[:, :-1] & m[:, 1:]).reshape(-1)
    at = jnp.asarray(attrs)
    a0 = at[:, :-1].reshape(-1)
    a1 = at[:, 1:].reshape(-1)
    seg2 = (m[:, :-1] & m[:, 1:])
    prev_valid = jnp.concatenate(
        [jnp.zeros((L, 1), bool), seg2[:, :-1]], axis=1
    )
    cap_a = (~prev_valid).reshape(-1).astype(jnp.float32)
    return CapsuleScene(
        a=a, ba=b - a, attr0=a0, dattr=a1 - a0, mask=seg_mask, cap_a=cap_a,
        radius=float(radius),
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["capsule", "frames"],
    meta_fields=["n_sides"],
)
@dataclasses.dataclass
class PrismScene:
    """Per-segment SoA for the N-gon prism renderer — the reference's
    triangle-tube raster geometry (`Tubes.hpp:40`, `LineData.hpp:374-386`)
    rendered analytically (`kernels/raster_prism.py`).

    capsule: the shared segment SoA (binning/payload rows 0-15 reuse the
             capsule pipeline byte-identically; cap_a is forced to 0 —
             the triangle tube is open-ended, no cap geometry).
    frames:  [12, S] parallel-transport frames per segment:
             rows 0-2 normal at a, 3-5 binormal at a, 6-8 normal at b,
             9-11 binormal at b (`geometry/frames.py`, the same frames
             `geometry/tubes.py` places ring vertices with).
    """

    capsule: CapsuleScene
    frames: jnp.ndarray
    n_sides: int

    @property
    def num_segments(self) -> int:
        return self.capsule.num_segments

    @property
    def radius(self) -> float:
        return self.capsule.radius

    # Duck-type the fields shared paths read off a scene (depth-cue range,
    # multi-chip band estimates).
    @property
    def a(self):
        return self.capsule.a

    @property
    def ba(self):
        return self.capsule.ba

    @property
    def mask(self):
        return self.capsule.mask


def build_prism_scene(
    positions, mask, attrs, radius: float, n_sides: int = 8
) -> PrismScene:
    """positions [L, P, 3], mask [L, P], attrs [L, P] -> PrismScene.

    Ring vertices implied by (frames, n_sides, radius) are identical to
    `geometry/tubes.py:build_tube_triangle_mesh` (same
    parallel_transport_frames, same tube_ring_directions angles)."""
    from linevis_tpu.geometry.frames import parallel_transport_frames

    cap = build_capsule_scene(positions, mask, attrs, radius)
    cap = dataclasses.replace(cap, cap_a=jnp.zeros_like(cap.cap_a))
    pos = jnp.asarray(positions)
    _, normals, binormals = parallel_transport_frames(
        pos, jnp.asarray(mask)
    )  # [L, P, 3] each

    def seg_rows(g):  # [L, P, 3] -> a-end [3, S], b-end [3, S]
        L, P = g.shape[0], g.shape[1]
        cf = g.reshape(L * P, 3).T.reshape(3, L, P)
        return cf[:, :, :-1].reshape(3, -1), cf[:, :, 1:].reshape(3, -1)

    na, nb = seg_rows(normals)
    bna, bnb = seg_rows(binormals)
    frames = jnp.concatenate([na, bna, nb, bnb], axis=0).astype(jnp.float32)
    return PrismScene(capsule=cap, frames=frames, n_sides=int(n_sides))


def prepare_prism_frame(
    scene: PrismScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
):
    """Capsule binning (the octagon is inscribed in the capsule, so the
    conservative screen bbox and the exact 2D capsule-vs-tile cull remain
    valid) + frame rows appended by sorted-id gather AFTER the sort, so
    the sort width stays at the capsule's 16 operands."""
    from linevis_tpu.kernels.raster_prism import ROW_FRAME0

    csr, params, basis = prepare_capsule_frame(
        scene.capsule, view_proj, camera_position, proj_ab, settings
    )
    p = csr.payload  # [24, Np + C] (16 sorted + 8 derived)
    S = scene.num_segments
    ids = jnp.clip(p[9].astype(jnp.int32), 0, S - 1)
    frame_rows = scene.frames[:, ids]  # [12, Np + C]
    pad_rows = ROW_FRAME0 - p.shape[0]
    if pad_rows > 0:
        p = jnp.concatenate(
            [p, jnp.zeros((pad_rows, p.shape[1]), jnp.float32)], axis=0
        )
    csr = dataclasses.replace(
        csr, payload=jnp.concatenate([p[:ROW_FRAME0], frame_rows], axis=0)
    )
    return csr, params, basis


@partial(jax.jit, static_argnames=("settings", "sub"))
def render_tubes_prism(
    scene: PrismScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,  # [2]
    settings: RasterSettings,
    sub: int = 32,
) -> jnp.ndarray:
    """Render N-gon prism tubes -> [4, H, W] linear RGBA.

    The flagship PARITY geometry: the reference's 8-subdivision triangle
    tube silhouette and shading at capsule-kernel throughput (see
    `kernels/raster_prism.py` for the planarized-quad bound)."""
    from linevis_tpu.kernels.raster_prism import rasterize_prisms_pallas

    csr, params, basis = prepare_prism_frame(
        scene, view_proj, camera_position, proj_ab, settings
    )
    interpret = jax.default_backend() == "cpu"
    depth_t, id_t, gbuf_t = rasterize_prisms_pallas(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, interpret=interpret,
        sub=sub, n_sides=scene.n_sides,
    )

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
            settings.width, settings.height,
        )

    zndc = unp(depth_t)
    seg_id = unp(id_t)
    attr, nx, ny, nz, tx, ty, tz, cov = (unp(b) for b in gbuf_t)

    w_all = view_proj[3, :3] @ scene.a + view_proj[3, 3]
    big = jnp.float32(3e38)
    dmin = jnp.min(jnp.where(scene.mask, w_all, big))
    dmax = jnp.max(jnp.where(scene.mask, w_all, -big))

    return shade_capsules(
        zndc, seg_id, attr,
        jnp.stack([nx, ny, nz], axis=0), jnp.stack([tx, ty, tz], axis=0),
        camera_position, basis, proj_ab, dmin, dmax, settings,
    )


def _proj_constants(camera: Camera) -> np.ndarray:
    """[A, Bc] of z_ndc = A - Bc / view_z for the camera's projection."""
    n, f = camera.z_near, camera.z_far
    return np.array([f / (f - n), f * n / (f - n)], np.float32)


def _ray_basis(view_proj: jnp.ndarray) -> jnp.ndarray:
    """[3, 3] columns (right/tan_x, up/tan_y, forward) — see opaque.py."""
    fwd = view_proj[3, :3]
    r = view_proj[0, :3]
    u = view_proj[1, :3]
    tx = jnp.linalg.norm(r)
    ty = jnp.linalg.norm(u)
    return jnp.stack(
        [
            r / jnp.maximum(tx * tx, 1e-12),
            u / jnp.maximum(ty * ty, 1e-12),
            fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-12),
        ],
        axis=1,
    )


def prepare_capsule_frame(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,  # [2] = (A, Bc)
    settings: RasterSettings,
    z_near: float = 1e-3,
    seg_alpha: jnp.ndarray = None,  # [2, S] (alpha0, dalpha) rows 11-12
    y_offset: jnp.ndarray = None,  # band-local rendering: global y of row 0
    full_height: int = None,  # full-frame height when y_offset is used
    aa_margin: float = 0.0,  # extra px of cull slack (coverage-AA callers)
):
    """Project segments, build the CSR binning + kernel params.

    With `y_offset`/`full_height` set, projection happens in FULL-frame
    pixel space and is shifted into band-local rows — the image-space
    multi-chip sharding path (parallel/mesh.py); `settings.height` is then
    the band height. The returned params carry the band-windowed ray
    basis, so the kernels reconstruct correct full-frame rays from
    band-local pixel coordinates.
    """
    o = camera_position
    a = scene.a
    b = scene.a + scene.ba
    r = scene.radius
    proj_h = full_height if full_height is not None else settings.height

    def project(p):  # p [3, S] -> (sx, sy, w)
        clip = view_proj[:3, :3] @ p + view_proj[:3, 3][:, None]
        w = view_proj[3, :3] @ p + view_proj[3, 3]
        iw = 1.0 / jnp.where(jnp.abs(w) < z_near, z_near, w)
        sx = (clip[0] * iw * 0.5 + 0.5) * settings.width
        sy = (0.5 - clip[1] * iw * 0.5) * proj_h
        if y_offset is not None:
            sy = sy - y_offset
        return sx, sy, w

    sxa, sya, wa = project(a)
    sxb, syb, wb = project(b)
    wmin = jnp.minimum(wa, wb)
    valid = scene.mask & (wmin > z_near)

    # Conservative screen-space radius: r scaled by pixels-per-world-unit at
    # the segment's nearest depth.
    px_per_unit = jnp.maximum(
        0.5 * settings.width * jnp.linalg.norm(view_proj[0, :3]),
        0.5 * settings.height * jnp.linalg.norm(view_proj[1, :3]),
    )
    # aa_margin (0.5 px from coverage-AA callers): the analytic AA accepts
    # silhouettes up to half a pixel outside the geometric radius
    # (kernels/raster_capsule.py use_aa). OIT callers pass 0: their kernels
    # reject these candidates anyway, and the binning perturbation would
    # change chunk partitioning (tie pairs split across chunk boundaries).
    sr = r * px_per_unit / jnp.maximum(wmin - r, z_near) + aa_margin
    xmin = jnp.minimum(sxa, sxb) - sr
    xmax = jnp.maximum(sxa, sxb) + sr
    ymin = jnp.minimum(sya, syb) - sr
    ymax = jnp.maximum(sya, syb) + sr

    # Payload rows.
    oa = o[:, None] - a
    ba = scene.ba
    baba = jnp.sum(ba * ba, axis=0)
    oaoa = jnp.sum(oa * oa, axis=0)
    ob = oa - ba
    obob = jnp.sum(ob * ob, axis=0)
    rr = r * r
    Ca = oaoa - rr
    Cb = obob - rr
    S = scene.num_segments
    ids = jnp.arange(S, dtype=jnp.float32)
    vz_min = jnp.maximum(wmin - r, z_near)
    zndc_min = proj_ab[0] - proj_ab[1] / vz_min
    zq = jnp.floor(jnp.clip(zndc_min, 0.0, 1.0) * 1023.0) / 1023.0
    if seg_alpha is None:
        alpha0 = jnp.ones((S,), jnp.float32)
        dalpha = jnp.zeros((S,), jnp.float32)
    else:
        alpha0, dalpha = seg_alpha[0], seg_alpha[1]
    payload = jnp.stack(
        [
            oa[0], oa[1], oa[2],
            ba[0], ba[1], ba[2],
            jnp.full((S,), r, jnp.float32),
            scene.attr0,
            scene.dattr,
            ids,
            baba,
            alpha0,  # row 11: per-segment alpha (opacity optimization)
            dalpha,  # row 12
            scene.cap_a,  # row 13: render the start cap (chain starts only)
            Cb,
            zq,
        ],
        axis=0,
    ).astype(jnp.float32)

    csr = build_sorted_binning(
        xmin, xmax, ymin, ymax, payload, valid,
        settings.width, settings.height,
        settings.tile_w, settings.tile_h, settings.chunk,
        settings.span_x, settings.span_y,
        # Exact screen-space capsule-vs-tile cull (projection of a segment
        # is a segment; sr is the radius at the nearest depth, so the 2D
        # capsule with radius sr contains the true silhouette).
        seg2d=(sxa, sya, sxb, syb, sr),
    )

    # Derived per-candidate scalar rows 16-23, appended AFTER the sort so
    # the sort width stays at 16 operands (sort cost scales with operand
    # count; these are pure functions of the sorted geometry rows, a few
    # elementwise ops over the pair array). The kernels read them instead
    # of re-deriving per block: per-candidate scalars live on SUBLANES
    # ([sub, 1] shapes), where even 5-op dot products cost real vregs.
    # Padding columns get finite garbage (inv of eps); kernels mask all
    # candidate work with in_run, which is False there.
    p = csr.payload
    poa = p[0:3]
    pba = p[3:6]
    pr = p[6]
    pbaba = p[10]
    baoa0 = pba[0] * poa[0] + pba[1] * poa[1] + pba[2] * poa[2]
    oaoa0 = poa[0] * poa[0] + poa[1] * poa[1] + poa[2] * poa[2]
    inv_baba = 1.0 / jnp.maximum(pbaba, 1e-20)
    prr = pr * pr
    tnorm = jax.lax.rsqrt(jnp.maximum(pbaba, 1e-20))
    inv_r = 1.0 / jnp.maximum(pr, 1e-12)
    derived = jnp.stack(
        [baoa0, oaoa0, inv_baba, prr * pbaba, tnorm, inv_r, prr,
         jnp.zeros_like(pr)],
        axis=0,
    )
    csr = dataclasses.replace(
        csr, payload=jnp.concatenate([p, derived], axis=0)
    )

    basis = _ray_basis(view_proj)  # columns right, up, fwd
    if y_offset is not None:
        # Band window: the kernel computes v_band = 1 - y_local*(2/band_h);
        # the true v_full = a*v_band + c with a = band_h/full_h and
        # c = 1 - a - 2*y_offset/full_h.  Fold the affine map into the
        # basis columns: up' = up*a, fwd' = fwd + up*c.
        a_win = settings.height / proj_h
        c_win = 1.0 - a_win - 2.0 * y_offset / proj_h
        basis = jnp.stack(
            [
                basis[:, 0],
                basis[:, 1] * a_win,
                basis[:, 2] + basis[:, 1] * c_win,
            ],
            axis=1,
        )
    # params rows 0-8: B row-major where dir_i = B[i,0]*u + B[i,1]*v + B[i,2].
    # 9 zA, 10 zB, 11 dmin, 12 dmax, 13 depth-cue, 14 opacity scale,
    # 15 logDepthMin, 16 logDepthMax, 17 moment bias, 18 overestimation
    # (15-18 are MBOIT, MomentOIT.glsl uniforms), 19 px scale: world units
    # per pixel at view depth 1 (the opaque kernel's coverage AA),
    # 20-22 MBOIT wrapping-zone y/z/w (trigonometric moments,
    # MBOITUtils.cpp:40-54), 23 spare, 24-27 background RGBA (in-kernel
    # composite mode of the OIT kernel), 28-31 spare.
    px_scale = (2.0 / settings.height) * jnp.linalg.norm(basis[:, 1])
    params = jnp.concatenate(
        [basis.reshape(-1), proj_ab, jnp.zeros((21,), jnp.float32)]
    )
    params = params.at[19].set(px_scale)
    return csr, params, basis


@partial(jax.jit, static_argnames=("settings", "sub"))
def render_tubes(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,  # [2]
    settings: RasterSettings,
    sub: int = 32,  # kernel compute sub-chunk width
) -> jnp.ndarray:
    """Render capsules -> [4, H, W] linear RGBA (channels-first)."""
    csr, params, basis = prepare_capsule_frame(
        scene, view_proj, camera_position, proj_ab, settings,
        aa_margin=0.5 if settings.aa else 0.0,
    )
    interpret = jax.default_backend() == "cpu"
    depth_t, id_t, gbuf_t = rasterize_capsules_pallas(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, interpret=interpret,
        use_aa=settings.aa, sub=sub,
    )

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
            settings.width, settings.height,
        )

    zndc = unp(depth_t)
    seg_id = unp(id_t)
    attr, nx, ny, nz, tx, ty, tz, cov = (unp(b) for b in gbuf_t)

    # Depth-cue range over segment endpoints (reference DepthCues.hpp).
    w_all = view_proj[3, :3] @ scene.a + view_proj[3, 3]
    big = jnp.float32(3e38)
    dmin = jnp.min(jnp.where(scene.mask, w_all, big))
    dmax = jnp.max(jnp.where(scene.mask, w_all, -big))

    return shade_capsules(
        zndc, seg_id, attr,
        jnp.stack([nx, ny, nz], axis=0), jnp.stack([tx, ty, tz], axis=0),
        camera_position, basis, proj_ab, dmin, dmax, settings,
        coverage=cov,
    )


def shade_capsules(
    zndc, seg_id, attr, normal_raw, tangent_raw, camera_position,
    ray_basis, proj_ab, depth_min, depth_max, settings: RasterSettings,
    coverage=None,
):
    """Pure elementwise shading from the kernel's G-buffer (no gathers)."""
    from linevis_tpu.render.transfer_function import tf_eval_points

    H, W = seg_id.shape
    fg = seg_id >= 0

    # Ray reconstruction for the fragment position.
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :] * (2.0 / W) - 1.0
    v = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None] * (2.0 / H)
    u = jnp.broadcast_to(u, (H, W))
    v = jnp.broadcast_to(v, (H, W))
    d = (
        ray_basis[:, 0][:, None, None] * u[None]
        + ray_basis[:, 1][:, None, None] * v[None]
        + ray_basis[:, 2][:, None, None]
    )
    view_z = proj_ab[1] / jnp.maximum(proj_ab[0] - zndc, 1e-9)
    # d has unit forward component -> pos = o + d * view_z.
    pos = camera_position[:, None, None] + d * view_z[None]

    normal = normalize3(normal_raw)
    tangent = normalize3(tangent_raw)
    rgb, alpha = tf_eval_points(settings.tf_color, settings.tf_opacity, attr)

    color = blinn_phong_shade_tube(rgb, pos, normal, tangent, camera_position)
    if settings.depth_cue_strength > 0.0:
        color = apply_depth_cue(
            color, view_z, depth_min, depth_max, settings.depth_cue_strength
        )
    bg = jnp.asarray(settings.background_color, jnp.float32)
    if coverage is not None:
        # Analytic edge AA: blend the fragment over the background by its
        # pixel coverage (interior pixels have coverage 1 — unchanged).
        c = jnp.where(fg, coverage, 0.0)
        out_rgb = color * c[None] + bg[:3, None, None] * (1.0 - c[None])
        out_a = alpha * c + bg[3] * (1.0 - c)
    else:
        out_rgb = jnp.where(fg[None], color, bg[:3, None, None])
        out_a = jnp.where(fg, alpha, bg[3])
    return jnp.concatenate([out_rgb, out_a[None]], axis=0)


def render_tubes_image(
    scene: CapsuleScene,
    camera: Camera,
    tf: Optional[TransferFunction] = None,
    settings: Optional[RasterSettings] = None,
    supersample: int = 1,
) -> np.ndarray:
    """Host convenience wrapper -> numpy [H, W, 4] linear RGBA."""
    settings = settings or RasterSettings(width=camera.width, height=camera.height)
    cam = camera
    s = settings
    if supersample > 1:
        s = dataclasses.replace(
            settings, width=settings.width * supersample,
            height=settings.height * supersample,
        )
        cam = dataclasses.replace(camera, width=s.width, height=s.height)
    if tf is not None:
        c_pts, o_pts = tf.as_static_points()
        s = dataclasses.replace(s, tf_color=c_pts, tf_opacity=o_pts)
    img = render_tubes(
        scene,
        jnp.asarray(cam.view_projection_matrix()),
        jnp.asarray(np.asarray(camera.position, np.float32)),
        jnp.asarray(_proj_constants(camera)),
        s,
    )
    img = np.moveaxis(np.asarray(img), 0, -1)
    if supersample > 1:
        k = supersample
        H, W = settings.height, settings.width
        img = img.reshape(H, k, W, k, 4).mean(axis=(1, 3))
    return img


def render_tubes_prism_image(
    scene: PrismScene,
    camera: Camera,
    tf: Optional[TransferFunction] = None,
    settings: Optional[RasterSettings] = None,
    supersample: int = 1,
) -> np.ndarray:
    """Host convenience wrapper for the prism path -> [H, W, 4] linear.

    The prism raster has binary coverage (no analytic AA: the faceted
    silhouette's edges are straight lines, matching the reference's
    triangle raster + MSAA), so `supersample=2` plays the MSAA role."""
    settings = settings or RasterSettings(width=camera.width, height=camera.height)
    cam = camera
    s = settings
    if supersample > 1:
        s = dataclasses.replace(
            settings, width=settings.width * supersample,
            height=settings.height * supersample,
        )
        cam = dataclasses.replace(camera, width=s.width, height=s.height)
    if tf is not None:
        c_pts, o_pts = tf.as_static_points()
        s = dataclasses.replace(s, tf_color=c_pts, tf_opacity=o_pts)
    img = render_tubes_prism(
        scene,
        jnp.asarray(cam.view_projection_matrix()),
        jnp.asarray(np.asarray(camera.position, np.float32)),
        jnp.asarray(_proj_constants(camera)),
        s,
    )
    img = np.moveaxis(np.asarray(img), 0, -1)
    if supersample > 1:
        k = supersample
        H, W = settings.height, settings.width
        img = img.reshape(H, k, W, k, 4).mean(axis=(1, 3))
    return img
