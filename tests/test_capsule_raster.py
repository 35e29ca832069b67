"""Capsule rasterizer vs brute-force numpy ray-capsule reference."""

import numpy as np
import jax.numpy as jnp

from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.tube_raster import (
    CapsuleScene,
    build_capsule_scene,
    render_tubes_image,
    prepare_capsule_frame,
    _proj_constants,
)
from linevis_tpu.kernels.raster_capsule import rasterize_capsules_pallas
from linevis_tpu.kernels.tiles import unpack_tiles

W, H = 64, 32


def _ray_capsule_np(o, d, a, b, r):
    """Brute-force: returns t (inf if miss) for unit-ish d (unnormalized ok)."""
    dn = d / np.linalg.norm(d)
    ba = b - a
    oa = o - a
    baba = ba @ ba
    bard = ba @ dn
    baoa = ba @ oa
    rdoa = dn @ oa
    oaoa = oa @ oa
    k2 = baba - bard * bard
    k1 = baba * rdoa - baoa * bard
    k0 = baba * oaoa - baoa * baoa - r * r * baba
    best = np.inf
    h = k1 * k1 - max(k2, 1e-12) * k0
    if h >= 0 and k2 > 1e-12:
        t = (-k1 - np.sqrt(h)) / k2
        y = baoa + t * bard
        if t > 0 and 0 < y < baba:
            best = min(best, t)
    for cen, lo in ((a, True), (b, False)):
        oc = o - cen
        b1 = dn @ oc
        c = oc @ oc - r * r
        hh = b1 * b1 - c
        if hh >= 0:
            t = -b1 - np.sqrt(hh)
            y = baoa + t * bard
            if t > 0 and ((lo and y <= 0) or (not lo and y >= baba)):
                best = min(best, t)
    return best


def _scene_two_segments():
    pos = np.array(
        [
            [[-0.3, 0.0, 0.0], [0.3, 0.0, 0.0]],
            [[0.0, -0.3, 0.1], [0.0, 0.3, 0.1]],
        ],
        np.float32,
    )
    mask = np.ones((2, 2), bool)
    attrs = np.array([[0.2, 0.8], [0.4, 0.6]], np.float32)
    return build_capsule_scene(pos, mask, attrs, radius=0.08)


def test_capsule_raster_matches_bruteforce():
    scene = _scene_two_segments()
    cam = Camera(position=(0.1, 0.2, 1.4), width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8, chunk=16,
                       span_x=4, span_y=4)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    csr, params, basis = prepare_capsule_frame(scene, vp, cp, ab, S)
    assert csr.payload.shape[0] == 24  # 16 geometry + 8 derived scalars
    # use_aa=False: this is the geometric-exactness oracle; the coverage
    # AA intentionally accepts sub-half-pixel near-misses
    # (test_coverage_aa below).
    d_t, id_t, u_t = rasterize_capsules_pallas(
        csr, params, W, H, S.tile_w, S.tile_h, interpret=True, use_aa=False
    )
    seg_id = np.asarray(unpack_tiles(id_t, csr.tiles_x, csr.tiles_y,
                                     S.tile_w, S.tile_h, W, H))
    zndc = np.asarray(unpack_tiles(d_t, csr.tiles_x, csr.tiles_y,
                                   S.tile_w, S.tile_h, W, H))

    o, dirs = cam.generate_rays()
    a_np = np.asarray(scene.a).T
    ba_np = np.asarray(scene.ba).T
    A, Bc = np.asarray(_proj_constants(cam))
    mismatches = 0
    for py in range(H):
        for px in range(W):
            d = dirs[py, px]
            ts = [
                _ray_capsule_np(o, d, a_np[s], a_np[s] + ba_np[s], scene.radius)
                for s in range(scene.num_segments)
            ]
            sref = int(np.argmin(ts))
            if np.isinf(ts[sref]):
                if seg_id[py, px] != -1:
                    mismatches += 1
            else:
                if seg_id[py, px] != sref:
                    mismatches += 1
                else:
                    # compare ndc depth
                    fwd = np.asarray(basis)[:, 2]
                    vz = ts[sref] * (fwd @ (d / np.linalg.norm(d)))
                    z_ref = A - Bc / vz
                    assert abs(z_ref - zndc[py, px]) < 2e-3
    assert mismatches / (W * H) < 0.01, mismatches


def test_coverage_aa():
    """Analytic-coverage AA: interior pixels have coverage 1, partial
    coverage exists only in a narrow band around the brute-force
    silhouette, and every brute-force hit pixel has coverage > 0.5."""
    scene = _scene_two_segments()
    cam = Camera(position=(0.1, 0.2, 1.4), width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8, chunk=16,
                       span_x=4, span_y=4)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    csr, params, basis = prepare_capsule_frame(scene, vp, cp, ab, S,
                                               aa_margin=0.5)
    d_t, id_t, g_t = rasterize_capsules_pallas(
        csr, params, W, H, S.tile_w, S.tile_h, interpret=True
    )
    seg_id = np.asarray(unpack_tiles(id_t, csr.tiles_x, csr.tiles_y,
                                     S.tile_w, S.tile_h, W, H))
    cov = np.asarray(unpack_tiles(g_t[-1], csr.tiles_x, csr.tiles_y,
                                  S.tile_w, S.tile_h, W, H))
    assert ((cov >= 0.0) & (cov <= 1.0)).all()
    assert (cov[seg_id < 0] == 0.0).all()

    o, dirs = cam.generate_rays()
    a_np = np.asarray(scene.a).T
    ba_np = np.asarray(scene.ba).T
    hit = np.zeros((H, W), bool)
    for py in range(H):
        for px in range(W):
            d = dirs[py, px]
            ts = [
                _ray_capsule_np(o, d, a_np[s], a_np[s] + ba_np[s],
                                scene.radius)
                for s in range(scene.num_segments)
            ]
            hit[py, px] = np.isfinite(min(ts))
    # Brute-force hits carry majority coverage. Not all: where a NEARER
    # tube's edge band crosses a farther tube's interior, the nearer
    # partial fragment wins the z-test (the classic single-layer edge-AA
    # tradeoff, absorbed by the 2x SSAA of the flagship path).
    assert (cov[hit] > 0.5 - 1e-3).mean() > 0.9
    band = (seg_id >= 0) & ~hit
    assert (cov[band] <= 0.5 + 1e-3).all()
    grown = np.zeros_like(hit)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grown |= np.roll(np.roll(hit, dy, 0), dx, 1)
    assert grown[band].all()
    # Interior (4-neighborhood fully hit) pixels are fully covered —
    # except where the nearer tube's own edge crosses IN FRONT of the
    # farther tube's interior (interior here is of the union silhouette).
    interior = hit.copy()
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        interior &= np.roll(np.roll(hit, dy, 0), dx, 1)
    interior[0, :] = interior[-1, :] = False
    interior[:, 0] = interior[:, -1] = False
    assert (cov[interior] > 0.95).mean() > 0.85


def test_render_tubes_smoke():
    scene = _scene_two_segments()
    cam = Camera(position=(0.0, 0.0, 1.5), width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8, chunk=16,
                       span_x=4, span_y=4)
    img = render_tubes_image(scene, cam, settings=S)
    assert img.shape == (H, W, 4)
    assert np.isfinite(img).all()
    # Something rendered in the middle; corners are background white.
    assert (img[H // 2, :, :3] < 0.999).any()
    np.testing.assert_allclose(img[0, 0, :3], 1.0)


def test_render_tubes_deterministic():
    scene = _scene_two_segments()
    cam = Camera(position=(0.2, 0.1, 1.5), width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8, chunk=16,
                       span_x=4, span_y=4)
    a = render_tubes_image(scene, cam, settings=S)
    b = render_tubes_image(scene, cam, settings=S)
    np.testing.assert_array_equal(a, b)
