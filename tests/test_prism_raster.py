"""Prism (N-gon tube) rasterizer vs the exact triangle-tube geometry.

The prism kernel (`kernels/raster_prism.py`) renders the reference's
8-subdivision triangle tube (`Tubes.hpp:40`, `LineData.hpp:374-386`) by
clipping rays against the planarized side quads. Two guarantees are
pinned here:

1. On STRAIGHT runs the quads are exactly planar, so the prism surface
   IS the triangle mesh: depths must match a float64 brute-force
   ray-triangle oracle over `build_tube_triangle_mesh`'s triangles.
2. On curved lines the planarization deviation must stay sub-pixel:
   the prism image and the exact triangle G-buffer image agree to
   SSIM >= 0.98 (differences concentrate in binary-coverage edge
   pixels where any two rasterizers disagree).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from linevis_tpu.geometry.tubes import build_tube_triangle_mesh
from linevis_tpu.kernels.raster_prism import rasterize_prisms_pallas
from linevis_tpu.kernels.tiles import unpack_tiles
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.framebuffer import ssim
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.transfer_function import TransferFunction
from linevis_tpu.render.tube_raster import (
    _proj_constants,
    _ray_basis,
    build_prism_scene,
    prepare_prism_frame,
    render_tubes_prism,
)


def _render_prism_depth(scene, cam, settings):
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    csr, params, basis = prepare_prism_frame(scene, vp, cp, ab, settings)
    depth_t, id_t, _ = rasterize_prisms_pallas(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, interpret=True,
        n_sides=scene.n_sides,
    )
    unp = lambda x: unpack_tiles(  # noqa: E731
        x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
        settings.width, settings.height,
    )
    return np.asarray(unp(depth_t)), np.asarray(unp(id_t)), basis


def _triangle_oracle_zndc(mesh, cam, xs, ys, W, H):
    """float64 Moller-Trumbore nearest-hit NDC depth at pixel centers."""
    verts = np.asarray(mesh.vertices, np.float64)  # [3, V]
    tris = np.asarray(mesh.triangles)
    tmask = np.asarray(mesh.triangle_mask)
    v0 = verts[:, tris[0]][:, tmask]
    v1 = verts[:, tris[1]][:, tmask]
    v2 = verts[:, tris[2]][:, tmask]
    e1 = v1 - v0
    e2 = v2 - v0

    vp = np.asarray(cam.view_projection_matrix(), np.float64)
    basis = np.asarray(_ray_basis(jnp.asarray(vp, jnp.float32)), np.float64)
    o = np.asarray(cam.position, np.float64)
    A, B = np.asarray(_proj_constants(cam), np.float64)

    out = np.full(len(xs), 2.0)
    for i, (x, y) in enumerate(zip(xs, ys)):
        u = (x + 0.5) * 2.0 / W - 1.0
        v = 1.0 - (y + 0.5) * 2.0 / H
        d = basis[:, 0] * u + basis[:, 1] * v + basis[:, 2]
        invlen = 1.0 / np.linalg.norm(d)
        dn = d * invlen
        pvec = np.cross(dn[None, :], e2.T)  # [T, 3]
        det = np.sum(e1.T * pvec, axis=1)
        ok = np.abs(det) > 1e-14
        inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o[None, :] - v0.T
        uu = np.sum(tvec * pvec, axis=1) * inv_det
        qvec = np.cross(tvec, e1.T)
        vv = np.sum(dn[None, :] * qvec, axis=1) * inv_det
        tt = np.sum(e2.T * qvec, axis=1) * inv_det
        hit = ok & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 1e-9)
        if hit.any():
            t = tt[hit].min()
            vz = t * invlen
            out[i] = A - B / vz
    return out


def _straight_scene(radius=0.07):
    P = 6
    pos = np.zeros((1, P, 3), np.float32)
    pos[0, :, 0] = np.linspace(-0.45, 0.45, P)
    pos[0, :, 1] = 0.05
    mask = np.ones((1, P), bool)
    attrs = np.linspace(0, 1, P, dtype=np.float32)[None]
    return pos, mask, attrs, radius


def test_prism_straight_matches_triangle_oracle():
    pos, mask, attrs, radius = _straight_scene()
    scene = build_prism_scene(pos, mask, attrs, radius)
    mesh = build_tube_triangle_mesh(
        jnp.asarray(pos), jnp.asarray(mask), jnp.asarray(attrs),
        radius=radius, num_subdivisions=8,
    )
    W, H = 96, 64
    cam = Camera(position=(0.1, 0.3, 1.3), look_at_point=(0, 0, 0),
                 width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8)
    depth, seg_id, _ = _render_prism_depth(scene, cam, S)

    # Bias sampling to the tube's rows (the thin tube covers few of the
    # 96x64 pixels; uniform sampling leaves too few on-tube samples).
    hit_ys, hit_xs = np.nonzero(seg_id >= 0)
    assert hit_xs.size > 60  # the tube is visible at all
    rng = np.random.default_rng(7)
    pick = rng.choice(hit_xs.size, size=min(200, hit_xs.size), replace=False)
    xs = np.concatenate([rng.integers(0, W, 300), hit_xs[pick]])
    ys = np.concatenate([rng.integers(0, H, 300), hit_ys[pick]])
    oracle = _triangle_oracle_zndc(mesh, cam, xs, ys, W, H)
    got = depth[ys, xs]

    o_hit = oracle < 1.5
    g_hit = seg_id[ys, xs] >= 0
    # Hit/miss decisions may differ only on silhouette edge pixels.
    assert np.mean(o_hit ^ g_hit) < 0.03
    both = o_hit & g_hit
    assert both.sum() > 30
    assert np.max(np.abs(got[both] - oracle[both])) < 2e-4


def test_prism_curved_matches_triangle_gbuffer_ssim():
    from linevis_tpu.render.opaque import render_opaque

    L, P = 4, 24
    t = np.linspace(0, 2.5, P)
    pos = np.stack(
        [
            np.stack(
                [0.4 * np.cos(t + i), 0.4 * np.sin(t + i),
                 0.15 * t - 0.2 + 0.05 * i], -1,
            )
            for i in range(L)
        ]
    ).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    mask = np.ones((L, P), bool)
    attrs = np.tile(np.linspace(0, 1, P)[None], (L, 1)).astype(np.float32)
    radius = 0.04

    W, H = 160, 120
    cam = Camera(position=(0.0, 0.15, 1.4), look_at_point=(0, 0, 0),
                 width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))

    scene = build_prism_scene(pos, mask, attrs, radius)
    img_p = np.asarray(render_tubes_prism(scene, vp, cp, ab, S))
    mesh = build_tube_triangle_mesh(
        jnp.asarray(pos), jnp.asarray(mask), jnp.asarray(attrs),
        radius=radius, num_subdivisions=8,
    )
    tf_table = jnp.asarray(TransferFunction.standard().table)
    img_t = np.asarray(render_opaque(mesh, vp, cp, tf_table, S))

    assert np.isfinite(img_p).all()
    s = ssim(img_p[:3].mean(0), img_t[:3].mean(0))
    mad = float(np.abs(img_p - img_t).mean())
    assert s >= 0.98, f"prism vs exact-triangle SSIM {s}"
    assert mad < 4e-3, f"mean abs diff {mad}"


def test_prism_open_end_shows_background():
    # Tube axis pointing nearly at the camera: looking down the open end
    # must show background through the middle (the triangle tube has no
    # cap geometry; entering through a ring plane is a miss — and from
    # exactly on-axis ALL faces are back faces, so nothing renders at
    # all, matching the reference's CULL_BACK). A slightly off-axis
    # camera sees the outer wall as a partial ring around a see-through
    # interior.
    P = 4
    pos = np.zeros((1, P, 3), np.float32)
    pos[0, :, 2] = np.linspace(0.4, -0.4, P)
    mask = np.ones((1, P), bool)
    attrs = np.full((1, P), 0.5, np.float32)
    scene = build_prism_scene(pos, mask, attrs, 0.1)
    W, H = 64, 48
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8)

    # Exactly on-axis: back faces only -> pure background.
    cam0 = Camera(position=(0.0, 0.0, 1.3), look_at_point=(0, 0, 0),
                  width=W, height=H)
    _, seg_id0, _ = _render_prism_depth(scene, cam0, S)
    assert (seg_id0 >= 0).sum() == 0

    # Slightly off-axis: outer wall visible, interior still see-through.
    cam = Camera(position=(0.18, 0.13, 1.2), look_at_point=(0, 0, 0.1),
                 width=W, height=H)
    depth, seg_id, _ = _render_prism_depth(scene, cam, S)
    assert (seg_id >= 0).sum() > 20
    # Rays that enter through the near ring plane are misses: the pixel
    # column straight down the tube interior shows background. Project
    # the axis midpoint's pixel by construction (camera looks at it).
    assert seg_id[H // 2, W // 2] == -1


def test_prism_masked_and_single_segment():
    pos = np.zeros((2, 3, 3), np.float32)
    pos[0, :, 0] = [-0.3, 0.0, 0.3]
    pos[1, :, 0] = [-0.3, 0.0, 0.3]
    pos[1, :, 1] = 0.2
    mask = np.array([[True, True, True], [True, False, False]])
    attrs = np.full((2, 3), 0.5, np.float32)
    scene = build_prism_scene(pos, mask, attrs, 0.05)
    W, H = 64, 48
    cam = Camera(position=(0.0, 0.1, 1.2), look_at_point=(0, 0, 0),
                 width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8)
    depth, seg_id, _ = _render_prism_depth(scene, cam, S)
    hits = np.unique(seg_id[seg_id >= 0])
    # Only line 0's two segments (ids 0, 1) may appear; line 1 is masked.
    assert hits.size > 0 and set(hits.tolist()) <= {0, 1}


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
