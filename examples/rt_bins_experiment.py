"""Is the wavefront tracer still tree-quality-bound? 16 vs 32 SAH bins.

Doubling the bin count tightens the binned-SAH split toward the exact
sweep-SAH optimum; if Mrays/s stays flat, remaining time is traversal-
side and a sweep-SAH builder would not pay (VERDICT r4 #8 decision
rule). Writes the result table to stdout as JSON lines.

    PYTHONPATH=/root/repo:$PYTHONPATH python examples/rt_bins_experiment.py
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
    from linevis_tpu.ops.lbvh import build_bvh_sah
    from linevis_tpu.ops.wide_bvh import pack_wide_bvh
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.ray_tracer import render_tubes_raytraced_wavefront
    from linevis_tpu.render.tube_raster import (
        _proj_constants,
        build_capsule_scene,
    )
    from linevis_tpu.trace.fields import tornado_velocity
    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamlines,
    )

    W, H = 1920, 1080
    traj = trace_streamlines(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=512, max_steps=400,
                                  dt=1.0 / 150.0),
    )
    traj = normalize_attributes(normalize_trajectories(traj))
    scene = build_capsule_scene(
        traj.positions, traj.mask, traj.attributes[:, 0], radius=0.0015
    )
    cam = Camera(position=(0.0, 0.1, 1.2), width=W, height=H)
    settings = RasterSettings(width=W, height=H, tile_w=16, tile_h=8)
    ab = jnp.asarray(_proj_constants(cam))

    r = scene.radius
    a = np.asarray(scene.a)
    b = a + np.asarray(scene.ba)
    lo = np.minimum(a, b) - r
    hi = np.maximum(a, b) + r
    far = 1e7
    m = np.asarray(scene.mask)
    lo = np.where(m[None], lo, far)
    hi = np.where(m[None], hi, far)

    def cams(n, salt=0.0):
        vps, cps = [], []
        for i in range(n):
            c = cam.orbit(0.002 * (i + 1) + salt, 0.1, 1.2)
            vps.append(np.asarray(c.view_projection_matrix()))
            cps.append(np.asarray(c.position, np.float32))
        return jnp.asarray(np.stack(vps)), jnp.asarray(np.stack(cps))

    for bins in (16, 32):
        t0 = time.time()
        bvh = build_bvh_sah(lo.T, hi.T, num_bins=bins)
        wide = pack_wide_bvh(
            bvh, a, np.asarray(scene.ba), float(scene.radius),
            np.asarray(scene.attr0), np.asarray(scene.dattr),
            np.asarray(scene.cap_a),
        )
        groups = jnp.asarray(wide.groups)
        build_s = time.time() - t0

        @partial(jax.jit, static_argnames=("n",))
        def run_chain(vps, cps, n, groups=groups):
            def body(i, acc):
                img = render_tubes_raytraced_wavefront(
                    scene, vps[i], cps[i], ab, settings, K=8, opacity=0.3,
                    wide_groups=groups,
                )
                return acc + jnp.sum(img[0, ::97, ::101])
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def time_chain(n, reps=2, run_chain=run_chain):
            float(run_chain(*cams(n, salt=0.77 + n), n))
            ts = []
            for rep in range(reps):
                v, c = cams(n, salt=0.1 * rep + 0.013 * n)
                t0 = time.time()
                float(run_chain(v, c, n))
                ts.append(time.time() - t0)
            return float(np.median(ts))

        t1 = time_chain(1)
        tn = time_chain(3)
        frame_s = max(tn - t1, 1e-6) / 2
        print(json.dumps({
            "metric": f"rt_bins{bins}_mrays_per_s",
            "value": round(W * H / frame_s / 1e6, 2),
            "frame_ms": round(frame_s * 1e3, 2),
            "build_s": round(build_s, 1),
            "unit": "Mrays/s",
            "vs_baseline": 1.0,
        }), flush=True)


if __name__ == "__main__":
    main()
