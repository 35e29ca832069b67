"""Benchmark driver: Tornado opaque frame rate on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): >= 30 FPS on the Tornado config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from linevis_tpu.core.trajectories import (
        normalize_attributes,
        normalize_trajectories,
    )
    from linevis_tpu.geometry.tubes import build_tube_triangle_mesh
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.opaque import render_opaque
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.transfer_function import TransferFunction
    from linevis_tpu.trace.fields import tornado_velocity
    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamlines,
    )

    traj = trace_streamlines(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=512, max_steps=400, dt=1.0 / 150.0),
    )
    traj = normalize_attributes(normalize_trajectories(traj))
    mesh = build_tube_triangle_mesh(
        traj.positions, traj.mask, traj.attributes[:, 0], radius=0.0015,
        num_subdivisions=8,
    )
    cam = Camera(position=(0.0, 0.1, 1.2), width=800, height=600)
    settings = RasterSettings(width=800, height=600, pairs_capacity=2_000_000)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    tft = jnp.asarray(TransferFunction.standard().table)

    img = render_opaque(mesh, vp, cp, tft, settings)
    jax.block_until_ready(img)

    n = 20
    t0 = time.time()
    for _ in range(n):
        img = render_opaque(mesh, vp, cp, tft, settings)
    jax.block_until_ready(img)
    dt = (time.time() - t0) / n
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "tornado_opaque_800x600_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
