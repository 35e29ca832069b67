"""End-to-end slice: trace the Crawfis tornado and render opaque tubes.

Mirrors BASELINE.json config 1 ("Tornado flow lines — opaque tube
rasterization, 800x600, headless"). Renders through the flagship
analytic-capsule path with 2x supersampling (the reference's opaque mode
defaults to MSAA 8x; see README "TPU-first design decisions"), and keeps
the triangle G-buffer path as a cross-check render.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

from linevis_tpu.core.trajectories import normalize_attributes, normalize_trajectories
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.framebuffer import save_png
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.tube_raster import build_capsule_scene, render_tubes_image
from linevis_tpu.trace.fields import tornado_velocity
from linevis_tpu.trace.streamline import StreamlineTracingSettings, trace_streamlines


def main():
    print("devices:", jax.devices())
    t0 = time.time()
    traj = trace_streamlines(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=512, max_steps=400, dt=1.0 / 150.0),
    )
    traj = normalize_trajectories(traj)
    traj = normalize_attributes(traj)
    print(f"traced {traj.num_lines} lines x {traj.max_points} pts "
          f"in {time.time()-t0:.2f}s; valid points: {traj.mask.sum()}")

    scene = build_capsule_scene(
        traj.positions, traj.mask, traj.attributes[:, 0], radius=0.0015
    )
    print(f"{scene.num_segments} capsule segments")

    cam = Camera(position=(0.0, 0.1, 1.2), look_at_point=(0, 0, 0),
                 width=800, height=600)
    settings = RasterSettings(width=800, height=600, tile_w=32, tile_h=16,
                              depth_cue_strength=0.2)

    t0 = time.time()
    img = render_tubes_image(scene, cam, settings=settings, supersample=2)
    print(f"first frame (incl. compile): {time.time()-t0:.2f}s")

    n = 5
    t0 = time.time()
    for i in range(n):
        import dataclasses

        c = dataclasses.replace(cam, position=(0.002 * (i + 1), 0.1, 1.2))
        img = render_tubes_image(scene, c, settings=settings, supersample=2)
    dt = (time.time() - t0) / n
    print(f"steady-state (e2e incl. readback + 2x SSAA): "
          f"{dt*1000:.1f} ms/frame = {1.0/dt:.1f} FPS")

    os.makedirs("out", exist_ok=True)
    save_png("out/tornado_opaque.png", img)
    print("wrote out/tornado_opaque.png")


if __name__ == "__main__":
    main()
