"""Pallas wavefront 8-wide BVH traversal (TubeRayTracing.glsl role)."""

import numpy as np
import jax.numpy as jnp
import pytest

from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.ray_tracer import (
    build_capsule_bvh,
    build_wide_capsule_bvh,
    render_tubes_raytraced_wavefront,
)
from linevis_tpu.render.tube_raster import _proj_constants, build_capsule_scene

W, H = 64, 48


def _scene(radius=0.03, seed=12, L=5, P=8):
    rng = np.random.default_rng(seed)
    pos = np.cumsum(rng.normal(0, 0.07, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    mask = np.ones((L, P), bool)
    attrs = rng.uniform(0, 1, (L, P)).astype(np.float32)
    return build_capsule_scene(pos, mask, attrs, radius=radius)


def _args(scene):
    cam = Camera(position=(0.0, 0.1, 1.2), look_at_point=(0, 0, 0),
                 width=W, height=H)
    settings = RasterSettings(width=W, height=H, tile_w=16, tile_h=8,
                              chunk=32, span_x=3, span_y=3)
    return (
        jnp.asarray(cam.view_projection_matrix()),
        jnp.asarray(np.asarray(cam.position, np.float32)),
        jnp.asarray(_proj_constants(cam)),
        settings,
    )


def test_pack_wide_bvh_invariants():
    """Every primitive appears exactly once as a leaf; every internal
    pointer targets a valid later-or-any group; padding rows are inert."""
    from linevis_tpu.ops.wide_bvh import (
        LANE_ID,
        LANE_LEAF,
        LANE_PTR,
        pack_wide_bvh,
    )

    scene = _scene(L=7, P=9, seed=3)
    bvh = build_capsule_bvh(scene)
    wide = pack_wide_bvh(
        bvh, np.asarray(scene.a), np.asarray(scene.ba), float(scene.radius),
        np.asarray(scene.attr0), np.asarray(scene.dattr),
        np.asarray(scene.cap_a),
    )
    rec = wide.groups.reshape(wide.n_groups, 8, 128)
    leaf = rec[..., LANE_LEAF] > 0.5
    prims = rec[..., LANE_ID][leaf].astype(np.int64)
    S = scene.num_segments
    assert sorted(prims.tolist()) == list(range(S))
    ptrs = rec[..., LANE_PTR]
    internal = ptrs >= 0
    assert not (leaf & internal).any()
    assert (ptrs[internal] < wide.n_groups).all()
    # Each non-root group is pointed to exactly once.
    counts = np.bincount(ptrs[internal].astype(np.int64),
                         minlength=wide.n_groups)
    assert counts[0] == 0 and (counts[1:] == 1).all()


def test_wavefront_matches_mlab_two_sided():
    """Depth complexity <= K: the wavefront K-buffer and the raster MLAB
    K-buffer extract the same surfaces with the same dedup window and
    deferred shading -> images agree (both composite entry+exit, the
    reference ray tracer's convention)."""
    from linevis_tpu.render.oit import render_tubes_mlab

    scene = _scene()
    vp, cp, ab, settings = _args(scene)
    wf = np.asarray(render_tubes_raytraced_wavefront(
        scene, vp, cp, ab, settings, K=16, opacity=0.4
    ))
    assert np.isfinite(wf).all()
    ml = np.asarray(render_tubes_mlab(scene, vp, cp, ab, settings, K=16,
                                      opacity=0.4, two_sided=True))
    diff = np.abs(wf - ml)
    assert diff.mean() < 2e-3, diff.mean()
    assert (diff > 0.05).mean() < 0.01, (diff > 0.05).mean()


def test_wavefront_builders_agree():
    """Linear vs binned-SAH trees traverse to the same image (tree
    quality changes cost, never the K nearest surfaces). The only
    allowed difference is the MLAB overflow merge of beyond-K fragments,
    which is arrival-order dependent (the reference's any-hit path has
    the same property) — bounded to a sliver of deep pixels."""
    scene = _scene(seed=7)
    vp, cp, ab, settings = _args(scene)
    img_lin = np.asarray(render_tubes_raytraced_wavefront(
        scene, vp, cp, ab, settings, K=8, opacity=0.5,
        wide_groups=build_wide_capsule_bvh(scene, builder="linear"),
    ))
    img_sah = np.asarray(render_tubes_raytraced_wavefront(
        scene, vp, cp, ab, settings, K=8, opacity=0.5,
        wide_groups=build_wide_capsule_bvh(scene, builder="binned_sah"),
    ))
    assert np.isfinite(img_lin).all()
    diff = np.abs(img_lin - img_sah)
    assert diff.max() < 5e-3, diff.max()
    assert (diff > 1e-4).mean() < 0.005, (diff > 1e-4).mean()


def test_wavefront_single_segment():
    """Degenerate one-segment scene (single-leaf tree) renders."""
    pos = np.zeros((1, 2, 3), np.float32)
    pos[0, 0] = (-0.3, 0.0, 0.0)
    pos[0, 1] = (0.3, 0.0, 0.0)
    scene = build_capsule_scene(
        pos, np.ones((1, 2), bool),
        np.full((1, 2), 0.5, np.float32), radius=0.05,
    )
    vp, cp, ab, settings = _args(scene)
    img = np.asarray(render_tubes_raytraced_wavefront(
        scene, vp, cp, ab, settings, K=4, opacity=1.0
    ))
    assert np.isfinite(img).all()
    assert (img[3] > 0.5).any()  # tube visible
