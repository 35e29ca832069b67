"""MLAB transparency tests vs exact back-to-front blending."""

import pytest
import numpy as np
import jax.numpy as jnp

from linevis_tpu.render.camera import Camera
from linevis_tpu.render.oit import render_tubes_mlab_image
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.tube_raster import build_capsule_scene

W, H = 32, 16


def _layered_scene(n=4, radius=0.06):
    """n parallel horizontal tubes stacked in depth, all crossing center."""
    pos = np.zeros((n, 2, 3), np.float32)
    for i in range(n):
        pos[i, 0] = (-0.4, 0.0, 0.1 * i)
        pos[i, 1] = (0.4, 0.0, 0.1 * i)
    mask = np.ones((n, 2), bool)
    attrs = np.linspace(0.1, 0.9, n, dtype=np.float32)[:, None].repeat(2, 1)
    return build_capsule_scene(pos, mask, attrs, radius=radius)


def _settings():
    return RasterSettings(width=W, height=H, tile_w=16, tile_h=8, chunk=8,
                          span_x=3, span_y=3)


def test_mlab_center_blend_matches_manual():
    n = 2
    scene = _layered_scene(n)
    cam = Camera(position=(0.0, 0.0, 1.5), width=W, height=H)
    S = _settings()
    opacity = 0.4
    img = render_tubes_mlab_image(scene, cam, settings=S, K=4, opacity=opacity)
    px = img[H // 2, W // 2]
    assert np.isfinite(img).all()
    # All tubes + white background along the center ray. Each tube
    # contributes its FRONT-face fragment only (reference CULL_BACK for
    # transparency, LineRasterPass.cpp:86-91) with alpha = opacity.
    T = (1.0 - opacity) ** n
    # Alpha channel = total coverage.
    assert abs(px[3] - (1.0 - T)) < 1e-3, px
    # Front tube is nearest to the camera (z = 0.2 tube is at index n-1).
    # Background visible through: color must be strictly between the pure
    # front-tube color and white.
    assert (px[:3] < 1.0).all()


def test_mlab_opaque_limit_matches_opaque():
    """opacity=1 -> first fragment wins; compare against the opaque renderer."""
    from linevis_tpu.render.tube_raster import render_tubes_image

    scene = _layered_scene(3)
    cam = Camera(position=(0.1, 0.05, 1.5), width=W, height=H)
    S = _settings()
    img_t = render_tubes_mlab_image(scene, cam, settings=S, K=4, opacity=1.0)
    # aa=False: the OIT kernel uses the exact binary hit test; the opaque
    # side must match it (coverage AA would soften the compared edges).
    import dataclasses as _dc
    img_o = render_tubes_image(scene, cam, settings=_dc.replace(S, aa=False))
    # Colors match wherever both cover (modulo fp): transparent path shades
    # identically at alpha=1.
    cov_t = img_t[..., 3] > 0.5
    cov_o = (img_o[..., :3] < 0.999).any(-1)
    agree = cov_t == cov_o
    assert agree.mean() > 0.98
    both = cov_t & cov_o
    diff = np.abs(img_t[..., :3] - img_o[..., :3])[both]
    assert diff.max() < 2e-2, diff.max()


def test_mlab_deterministic():
    scene = _layered_scene(4)
    cam = Camera(position=(0.0, 0.1, 1.4), width=W, height=H)
    S = _settings()
    a = render_tubes_mlab_image(scene, cam, settings=S, K=2)
    b = render_tubes_mlab_image(scene, cam, settings=S, K=2)
    np.testing.assert_array_equal(a, b)


def test_wboit_and_depth_complexity():
    import jax.numpy as jnp
    from linevis_tpu.render.oit import render_depth_complexity, render_tubes_wboit
    from linevis_tpu.render.tube_raster import _proj_constants

    n = 3
    scene = _layered_scene(n)
    cam = Camera(position=(0.0, 0.0, 1.5), width=W, height=H)
    S = _settings()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))

    dc = np.asarray(render_depth_complexity(scene, vp, cp, ab, S))
    # Center ray crosses all n tubes -> n front-face fragments.
    assert dc[H // 2, W // 2] == n, dc[H // 2, W // 2]
    assert dc[0, 0] == 0

    img = np.asarray(render_tubes_wboit(scene, vp, cp, ab, S, opacity=0.4))
    assert np.isfinite(img).all()
    # Coverage alpha at center matches 1 - (1-a)^n.
    expect = 1.0 - (1.0 - 0.4) ** n
    assert abs(img[3, H // 2, W // 2] - expect) < 1e-2


def test_mboit_vs_exact_blend():
    """MBOIT approximates exact sorted blending (reference claim: MBOIT ~
    MLAB quality for moderate depth complexity)."""
    import jax.numpy as jnp
    from linevis_tpu.render.oit import render_tubes_mboit
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = _layered_scene(3)
    cam = Camera(position=(0.0, 0.0, 1.5), width=W, height=H)
    S = _settings()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))

    exact = render_tubes_mlab_image(scene, cam, settings=S, K=8, opacity=0.4)
    # 4 moments in the fast tier; the 6/8-moment sweep runs in the slow
    # tier (test_mboit_higher_moment_sweep).
    _check_mboit_vs_exact(scene, vp, cp, ab, S, exact, (4,))


def _check_mboit_vs_exact(scene, vp, cp, ab, S, exact, n_moms):
    from linevis_tpu.render.oit import render_tubes_mboit

    for n_mom in n_moms:
        img = np.moveaxis(
            np.asarray(render_tubes_mboit(
                scene, vp, cp, ab, S, n_mom=n_mom, opacity=0.4
            )), 0, -1,
        )
        assert np.isfinite(img).all()
        # Coverage (1 - total transmittance) is EXACT in MBOIT.
        np.testing.assert_allclose(
            img[..., 3], exact[..., 3], atol=2e-3,
        )
        diff = np.abs(img[..., :3] - exact[..., :3])
        assert diff.mean() < 0.02, (n_mom, diff.mean())
        assert diff.max() < 0.25, (n_mom, diff.max())


@pytest.mark.slow
def test_mboit_higher_moment_sweep():
    """6/8 power moments vs exact blending (full-tier half of
    test_mboit_vs_exact_blend)."""
    import jax.numpy as jnp
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = _layered_scene(3)
    cam = Camera(position=(0.0, 0.0, 1.5), width=W, height=H)
    S = _settings()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    exact = render_tubes_mlab_image(scene, cam, settings=S, K=8, opacity=0.4)
    _check_mboit_vs_exact(scene, vp, cp, ab, S, exact, (6, 8))


@pytest.mark.slow
def test_mboit_trigonometric_vs_exact_blend():
    """Trigonometric moments (usePowerMoments = false,
    TrigonometricMomentMath.glsl) approximate exact sorted blending at
    least as well as power moments on a layered scene."""
    import jax.numpy as jnp
    from linevis_tpu.render.oit import render_tubes_mboit
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = _layered_scene(3)
    cam = Camera(position=(0.0, 0.0, 1.5), width=W, height=H)
    S = _settings()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))

    exact = render_tubes_mlab_image(scene, cam, settings=S, K=8, opacity=0.4)
    for n_mom in (4, 6, 8):
        img = np.moveaxis(
            np.asarray(render_tubes_mboit(
                scene, vp, cp, ab, S, n_mom=n_mom, opacity=0.4,
                trigonometric=True,
            )), 0, -1,
        )
        assert np.isfinite(img).all()
        np.testing.assert_allclose(img[..., 3], exact[..., 3], atol=2e-3)
        diff = np.abs(img[..., :3] - exact[..., :3])
        assert diff.mean() < 0.02, (n_mom, diff.mean())
        assert diff.max() < 0.25, (n_mom, diff.max())


@pytest.mark.slow
def test_mboit_unorm16_pixel_format():
    """UNORM16 moment storage (MBOIT_PIXEL_FORMAT_UNORM_16): the
    quantization basis change + 16-bit grid + UNORM bias vectors give an
    image close to (but not identical with) the float32 path."""
    import jax.numpy as jnp
    from linevis_tpu.render.oit import render_tubes_mboit
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = _layered_scene(3)
    cam = Camera(position=(0.0, 0.0, 1.5), width=W, height=H)
    S = _settings()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))

    for trig in (False, True):
        f32 = np.asarray(render_tubes_mboit(
            scene, vp, cp, ab, S, n_mom=4, opacity=0.4,
            trigonometric=trig))
        u16 = np.asarray(render_tubes_mboit(
            scene, vp, cp, ab, S, n_mom=4, opacity=0.4,
            trigonometric=trig, pixel_format="unorm16"))
        assert np.isfinite(u16).all()
        # Coverage is exact in both formats (b0 stays float32, like the
        # reference's r32f zeroth-moment target).
        np.testing.assert_allclose(u16[3], f32[3], atol=1e-4)
        diff = np.abs(u16[:3] - f32[:3])
        assert diff.mean() < 0.02, (trig, diff.mean())
        assert diff.max() < 0.3, (trig, diff.max())


def test_mboit_single_layer_near_exact():
    """One transparent layer: moment reconstruction is exact."""
    import jax.numpy as jnp
    from linevis_tpu.render.oit import render_tubes_mboit
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = _layered_scene(1)
    cam = Camera(position=(0.0, 0.0, 1.5), width=W, height=H)
    S = _settings()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    exact = render_tubes_mlab_image(scene, cam, settings=S, K=8, opacity=0.5)
    img = np.moveaxis(
        np.asarray(render_tubes_mboit(scene, vp, cp, ab, S, opacity=0.5)),
        0, -1,
    )
    diff = np.abs(img - exact)
    assert diff.max() < 0.06, diff.max()


def test_depth_peeling_exact_beyond_k():
    """Peeling with K=2 x 4 passes must equal exact K=32 blending on a
    6-layer scene (depth complexity 12 > any single pass's K)."""
    import jax.numpy as jnp
    from linevis_tpu.render.oit import render_tubes_depth_peeling
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = _layered_scene(3)  # 6 fragments/pixel at center
    cam = Camera(position=(0.0, 0.0, 1.5), width=W, height=H)
    S = _settings()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    exact = render_tubes_mlab_image(scene, cam, settings=S, K=8, opacity=0.4)
    img = np.moveaxis(
        np.asarray(render_tubes_depth_peeling(
            scene, vp, cp, ab, S, K=2, passes=4, opacity=0.4
        )), 0, -1,
    )
    np.testing.assert_allclose(img, exact, atol=2e-3)


def test_mlab_buckets_near_exact():
    import jax.numpy as jnp
    from linevis_tpu.render.oit import render_tubes_mlab_buckets
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = _layered_scene(3)
    cam = Camera(position=(0.0, 0.0, 1.5), width=W, height=H)
    S = _settings()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    exact = render_tubes_mlab_image(scene, cam, settings=S, K=8, opacity=0.4)
    # K=4 buckets: 4 exact + 4 merged covers all 6 layers exactly here.
    img = np.moveaxis(
        np.asarray(render_tubes_mlab_buckets(
            scene, vp, cp, ab, S, K=4, opacity=0.4
        )), 0, -1,
    )
    np.testing.assert_allclose(img, exact, atol=2e-3)


def test_saturation_culling_error_bound():
    """Behind-saturated-node rejection (sat=0.99) must stay within its
    bound vs culling effectively disabled (sat=2.0): dropped fragments
    merge under the last node with weight < 1-sat, composited under the
    preceding K-1 nodes' transmittance."""
    from linevis_tpu.kernels.raster_capsule_oit import (
        rasterize_capsules_mlab,
    )
    from linevis_tpu.render.tube_raster import (
        _proj_constants,
        prepare_capsule_frame,
    )

    n = 24  # depth complexity n = 24 >> K: deep overflow regime
    # Thick tubes: with front-face-only fragments the default radius
    # leaves the far tubes subpixel in y (no covered pixel center), and
    # too few fragments reach any one pixel for the last node to
    # saturate. radius 0.25 keeps every tube wider than a pixel.
    scene = _layered_scene(n, radius=0.25)
    cam = Camera(position=(0.0, 0.0, 4.0), width=W, height=H)
    S = _settings()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    csr, params, _ = prepare_capsule_frame(scene, vp, cp, ab, S)
    params = params.at[14].set(0.7)  # high opacity -> fast saturation

    def run(sat):
        K = 4
        d, rgb, a = rasterize_capsules_mlab(
            csr, params, W, H, S.tile_w, S.tile_h, K,
            tf_color=((0.0, 0.2, 0.4, 0.9), (1.0, 0.9, 0.3, 0.1)),
            tf_opacity=((0.0, 1.0), (1.0, 1.0)), sat=sat, interpret=True,
        )
        T = jnp.ones_like(a[0])
        acc = jnp.zeros((3,) + a.shape[1:], jnp.float32)
        for i in range(K):
            acc = acc + T[None] * rgb[:, i]
            T = T * (1.0 - a[i])
        return np.asarray(acc), np.asarray(1.0 - T)

    rgb_cull, a_cull = run(0.99)
    rgb_full, a_full = run(2.0)  # alpha never reaches 2: rejection off
    assert np.isfinite(rgb_cull).all() and np.isfinite(rgb_full).all()
    # The culled image must differ from the exact-overflow image by less
    # than (1 - sat) in any channel (the merge-weight bound).
    assert np.abs(rgb_cull - rgb_full).max() <= 0.01 + 1e-5
    assert np.abs(a_cull - a_full).max() <= 0.01 + 1e-5
    # And culling must actually have engaged (some pixel saturated).
    assert a_full.max() > 0.99


def test_narrow_insert_path_identical():
    """The K>8 narrow-insert fast path (occupancy-gated [8, P] inserts,
    kernels/raster_capsule_oit.py _NARROW_R) must be bit-identical to the
    full [K, P] insertion sort, across the occupancy crossover."""
    import jax

    import linevis_tpu.kernels.raster_capsule_oit as rco
    from linevis_tpu.render.tube_raster import (
        _proj_constants,
        prepare_capsule_frame,
    )

    scene = _layered_scene(24, radius=0.25)  # occupancy crosses 8
    cam = Camera(position=(0.0, 0.0, 4.0), width=W, height=H)
    S = _settings()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    csr, params, _ = prepare_capsule_frame(scene, vp, cp, ab, S)
    params = params.at[14].set(0.35)

    def run():
        d, rgb, a = rco.rasterize_capsules_mlab(
            csr, params, W, H, S.tile_w, S.tile_h, 16,
            tf_color=((0.0, 0.2, 0.4, 0.9), (1.0, 0.9, 0.3, 0.1)),
            tf_opacity=((0.0, 1.0), (1.0, 1.0)), interpret=True,
        )
        return np.asarray(d), np.asarray(rgb), np.asarray(a)

    saved = rco._NARROW_R
    try:
        d1, r1, a1 = run()
        assert int((d1 < 2.0).sum(0).max()) > 8  # crossover exercised
        rco._NARROW_R = 10 ** 9  # force the full path
        jax.clear_caches()
        d0, r0, a0 = run()
    finally:
        rco._NARROW_R = saved
        jax.clear_caches()
    assert np.array_equal(d0, d1)
    assert np.array_equal(r0, r1)
    assert np.array_equal(a0, a1)
