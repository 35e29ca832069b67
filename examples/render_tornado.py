"""End-to-end slice: trace the Crawfis tornado, mesh tubes, render opaque.

Mirrors BASELINE.json config 1 ("Tornado flow lines — opaque tube
rasterization, 800x600, headless").
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.core.trajectories import normalize_attributes, normalize_trajectories
from linevis_tpu.geometry.tubes import build_tube_triangle_mesh
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.framebuffer import save_png
from linevis_tpu.render.opaque import render_opaque
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.transfer_function import TransferFunction
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

    t0 = time.time()
    mesh = build_tube_triangle_mesh(
        traj.positions, traj.mask, traj.attributes[:, 0], radius=0.0015,
        num_subdivisions=8,
    )
    jax.block_until_ready(mesh.vertices)
    print(f"meshed {mesh.num_triangles} triangles in {time.time()-t0:.2f}s")

    cam = Camera(position=(0.0, 0.1, 1.2), look_at_point=(0, 0, 0),
                 width=800, height=600)
    settings = RasterSettings(width=800, height=600, depth_cue_strength=0.2)
    tf = TransferFunction.standard()

    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    tft = jnp.asarray(tf.table)

    t0 = time.time()
    img = render_opaque(mesh, vp, cp, tft, settings)
    jax.block_until_ready(img)
    print(f"first render (incl. compile): {time.time()-t0:.2f}s")

    n = 10
    t0 = time.time()
    for _ in range(n):
        img = render_opaque(mesh, vp, cp, tft, settings)
    jax.block_until_ready(img)
    dt = (time.time() - t0) / n
    print(f"steady-state: {dt*1000:.1f} ms/frame = {1.0/dt:.1f} FPS")

    save_png("out/tornado_opaque.png", np.moveaxis(np.asarray(img), 0, -1))
    print("wrote out/tornado_opaque.png")


if __name__ == "__main__":
    main()
