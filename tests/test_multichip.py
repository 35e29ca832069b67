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
