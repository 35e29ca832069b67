"""Quick chained-protocol prism-tube benchmark (Tornado, 1080p).

The prism path is the reference's 8-subdivision triangle-tube raster
default (`Tubes.hpp:40`, `LineData.hpp:374-386`) rendered analytically
(`kernels/raster_prism.py`). Same protocol as bench.py: N distinct-camera
frames in one jitted fori_loop, one readback; frame time =
(median t_N - median t_1)/(N - 1).

    PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_prism_quick.py [ss]

`ss` (default 1): supersample factor; 2 = the renderer's MSAA-role SSAA.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from functools import partial

    import numpy as np
    import jax.numpy as jnp

    from linevis_tpu.core.trajectories import (
        normalize_attributes,
        normalize_trajectories,
    )
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.tube_raster import (
        _proj_constants,
        build_prism_scene,
        render_tubes_prism,
    )
    from linevis_tpu.trace.fields import tornado_velocity
    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamlines,
    )

    ss = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    W, H = 1920 * ss, 1080 * ss
    traj = trace_streamlines(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=512, max_steps=400,
                                  dt=1.0 / 150.0),
    )
    traj = normalize_attributes(normalize_trajectories(traj))
    scene = build_prism_scene(
        traj.positions, traj.mask, traj.attributes[:, 0], radius=0.0015
    )
    cam = Camera(position=(0.0, 0.1, 1.2), width=W, height=H)
    settings = RasterSettings(width=W, height=H, tile_w=32, tile_h=16)
    ab = jnp.asarray(_proj_constants(cam))

    def cams(n, salt=0.0):
        vps, cps = [], []
        for i in range(n):
            c = cam.orbit(0.002 * (i + 1) + salt, 0.1, 1.2)
            vps.append(np.asarray(c.view_projection_matrix()))
            cps.append(np.asarray(c.position, np.float32))
        return jnp.asarray(np.stack(vps)), jnp.asarray(np.stack(cps))

    @partial(jax.jit, static_argnames=("n",))
    def run_chain(vps, cps, n):
        def body(i, acc):
            img = render_tubes_prism(scene, vps[i], cps[i], ab, settings)
            return acc + jnp.sum(img[0, ::97, ::101])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def time_chain(n, reps=4):
        float(run_chain(*cams(n, salt=0.77 + n), n))  # compile/warm
        ts = []
        for rep in range(reps):
            v, c = cams(n, salt=0.1 * rep + 0.013 * n)
            t0 = time.time()
            float(run_chain(v, c, n))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    # Finite-frame sanity on the real chip before timing (verify rule:
    # Mosaic transcendental lowering differs from interpret mode).
    v, c = cams(1, salt=0.5)
    img = np.asarray(render_tubes_prism(scene, v[0], c[0], ab, settings))
    assert np.isfinite(img).all(), "non-finite prism frame on device"
    fg = (np.abs(img[:3] - 1.0).max(0) > 1e-4).mean()
    print(json.dumps({"metric": "prism_fg_fraction", "value": round(float(fg), 4),
                      "unit": "fraction", "vs_baseline": 1.0}), flush=True)

    n = 8
    t1 = time_chain(1)
    tn = time_chain(n)
    frame_ms = max(tn - t1, 1e-6) / (n - 1) * 1e3
    print(json.dumps({
        "metric": f"prism_tubes_{W}x{H}_device_fps",
        "value": round(1000.0 / frame_ms, 2),
        "frame_ms": round(frame_ms, 2),
        "unit": "frames/s",
        "vs_baseline": round(1000.0 / frame_ms / 30.0, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
