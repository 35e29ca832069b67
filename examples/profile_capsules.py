"""Capsule renderer timing on the Tornado scene (forced-fetch timing)."""

import time

from _bench_common import tornado_scene

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.transfer_function import TransferFunction
from linevis_tpu.render.tube_raster import (
    _proj_constants,
    build_capsule_scene,
    render_tubes,
)
from functools import partial


def force(x):
    return float(jnp.sum(x[:, ::61, ::61]))


def main():
    traj, _, cam = tornado_scene()
    scene = build_capsule_scene(
        traj.positions, traj.mask, traj.attributes[:, 0], radius=0.0015
    )
    print(f"{scene.num_segments} segments")
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    tft = jnp.asarray(TransferFunction.standard().table)
    S = RasterSettings(width=800, height=600)

    fn = partial(render_tubes, settings=S)
    t0 = time.time()
    img = fn(scene, vp, cp, ab, tft)
    _ = force(img)
    print(f"first frame (compile): {time.time()-t0:.1f}s")

    ts = []
    for i in range(8):
        # vary camera slightly to defeat axon's dispatch dedup
        cam_i = cam.orbit(0.001 * (i + 1), 0.1, 1.2)
        vpi = jnp.asarray(cam_i.view_projection_matrix())
        cpi = jnp.asarray(np.asarray(cam_i.position, np.float32))
        t0 = time.time()
        img = fn(scene, vpi, cpi, ab, tft)
        _ = force(img)
        ts.append(time.time() - t0)
    ms = min(ts) * 1000
    print(f"steady-state: {ms:.1f} ms/frame = {1000.0/ms:.1f} FPS (min of {len(ts)})")
    print("all:", [f"{t*1000:.0f}" for t in ts])

    from linevis_tpu.render.framebuffer import save_png
    save_png("../out/tornado_capsules.png", np.moveaxis(np.asarray(img), 0, -1))
    print("wrote out/tornado_capsules.png")


if __name__ == "__main__":
    main()
