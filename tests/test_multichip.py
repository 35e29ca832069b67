"""Image-space sharding over the 8-device virtual CPU mesh."""

import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_matches_single():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from linevis_tpu.parallel.mesh import make_device_mesh, render_opaque_sharded
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.opaque import render_opaque
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.transfer_function import TransferFunction

    scene = ge._tiny_scene()
    n = 4
    height = 8 * n * 2
    cam = Camera(position=(0.0, 0.3, 1.2), width=128, height=height)
    settings = RasterSettings(width=128, height=height, chunk=64)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    tft = jnp.asarray(TransferFunction.standard().table)

    single = render_opaque(scene, vp, cp, tft, settings)
    mesh_dev = make_device_mesh(n)
    sharded = render_opaque_sharded(scene, vp, cp, tft, settings, mesh_dev)
    a, b = np.asarray(single), np.asarray(sharded)
    # Band-local pixel coordinates perturb edge/plane rounding: a tiny
    # fraction of edge pixels may flip coverage (large diff) and interpolated
    # attributes may differ at ~1e-4. Require both bounded.
    flips = (np.abs(a - b) > 1e-2).any(axis=0).mean()
    assert flips < 0.005, f"coverage flip fraction {flips}"
    close = (np.abs(a - b) <= 1e-2).all(axis=0)
    assert np.abs(a - b).max(axis=0)[close].max() < 5e-3


def test_mlab_sharded_matches_single_device():
    """Transparent (MLAB) image-space sharding: 8-band render == single
    device, bit-for-bit (per-pixel OIT has no cross-band coupling)."""
    import dataclasses

    import numpy as np
    import jax.numpy as jnp

    from linevis_tpu.parallel.mesh import (
        make_device_mesh,
        render_tubes_mlab_sharded,
    )
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.oit import render_tubes_mlab
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.tube_raster import (
        _proj_constants,
        build_capsule_scene,
    )

    rng = np.random.default_rng(9)
    L, P = 6, 6
    pos = np.cumsum(rng.normal(0, 0.07, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    scene = build_capsule_scene(
        pos, np.ones((L, P), bool),
        rng.uniform(0, 1, (L, P)).astype(np.float32), radius=0.04,
    )
    W, H = 32, 64  # 8 bands x 8 rows
    cam = Camera(position=(0.0, 0.1, 1.2), width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8, chunk=8,
                       span_x=3, span_y=3)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))

    single = np.asarray(render_tubes_mlab(scene, vp, cp, ab, S, K=4,
                                          opacity=0.4))
    mesh = make_device_mesh(8)
    sharded = np.asarray(render_tubes_mlab_sharded(
        scene, vp, cp, ab, S, mesh, K=4, opacity=0.4,
    ))
    assert sharded.shape == single.shape
    # MLAB's overflow merge is order-dependent (as in the reference,
    # where rasterization order varies); the band layout partitions runs
    # into different chunks, so deep merge-heavy pixels may differ.
    # Require agreement everywhere else: tiny mean, few outliers.
    diff = np.abs(sharded - single)
    assert diff.mean() < 1e-3, diff.mean()
    assert (diff > 0.02).mean() < 0.01, (diff > 0.02).mean()
    assert diff.max() < 0.2, diff.max()
