"""Wavefront BVH ray tracer: TPU correctness check + Mrays/s bench.

1. Small-scene Mosaic-vs-interpret cross-check (the wavefront kernel's
   TPU smoke): the CPU interpreter result is the oracle.
2. Tornado 1080p ray-traced transparency FPS + primary-ray Mrays/s,
   linear vs binned-SAH builders (the builder-quality delta table the
   `bvhBuildAlgorithm` setting is justified by).

    PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_wavefront_rt.py
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
    from linevis_tpu.kernels.bvh_wavefront import trace_wavefront_kbuffer
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.ray_tracer import (
        build_wide_capsule_bvh,
        _wavefront_core,
    )
    from linevis_tpu.render.tube_raster import (
        _proj_constants,
        build_capsule_scene,
    )
    from linevis_tpu.trace.fields import tornado_velocity
    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamlines,
    )

    # --- 1. Mosaic vs interpret cross-check on a small scene ---
    rng = np.random.default_rng(12)
    L, P = 5, 8
    pos = np.cumsum(rng.normal(0, 0.07, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    small = build_capsule_scene(
        pos, np.ones((L, P), bool),
        rng.uniform(0, 1, (L, P)).astype(np.float32), radius=0.03,
    )
    cam_s = Camera(position=(0.0, 0.1, 1.2), look_at_point=(0, 0, 0),
                   width=64, height=48)
    S_s = RasterSettings(width=64, height=48, tile_w=16, tile_h=8)
    groups_s = build_wide_capsule_bvh(small)
    args_s = (
        small,
        jnp.asarray(cam_s.view_projection_matrix()),
        jnp.asarray(np.asarray(cam_s.position, np.float32)),
        jnp.asarray(_proj_constants(cam_s)),
        groups_s,
    )
    img_tpu = np.asarray(_wavefront_core(*args_s, S_s, 8, 0.4, 1e6))
    with jax.default_device(jax.devices("cpu")[0]):
        img_cpu = np.asarray(_wavefront_core(
            small,
            jnp.asarray(np.asarray(cam_s.view_projection_matrix())),
            jnp.asarray(np.asarray(cam_s.position, np.float32)),
            jnp.asarray(np.asarray(_proj_constants(cam_s))),
            jnp.asarray(np.asarray(groups_s)),
            S_s, 8, 0.4, 1e6, True,
        ))
    diff = np.abs(img_tpu - img_cpu)
    assert np.isfinite(img_tpu).all(), "NaN on TPU"
    print(json.dumps({
        "metric": "wavefront_smoke_maxdiff", "value": float(diff.max()),
        "unit": "linear", "vs_baseline": 1.0 if diff.max() < 5e-3 else 0.0,
    }), flush=True)
    assert diff.max() < 5e-3, f"Mosaic-vs-interpret diff {diff.max()}"

    # --- 2. Tornado 1080p bench, linear vs binned SAH ---
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

    def cams(n, salt=0.0):
        vps, cps = [], []
        for i in range(n):
            c = cam.orbit(0.002 * (i + 1) + salt, 0.1, 1.2)
            vps.append(np.asarray(c.view_projection_matrix()))
            cps.append(np.asarray(c.position, np.float32))
        return jnp.asarray(np.stack(vps)), jnp.asarray(np.stack(cps))

    for builder in ("linear", "binned_sah"):
        t0 = time.time()
        groups = jax.block_until_ready(
            build_wide_capsule_bvh(scene, builder=builder)
        )
        t_build = time.time() - t0

        @partial(jax.jit, static_argnames=("n",))
        def run_chain(vps, cps, groups, n):
            # groups must be a REAL argument: a default/closure value would
            # be embedded as a ~120 MB HLO constant and blow the remote
            # compiler's request-size limit (HTTP 413).
            def body(i, acc):
                img = _wavefront_core(
                    scene, vps[i], cps[i], ab, groups, settings, 8, 0.3, 1e6
                )
                return acc + jnp.sum(img[0, ::97, ::101])
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def time_chain(n, reps=3, run_chain=run_chain, groups=groups):
            float(run_chain(*cams(n, salt=0.77 + n), groups, n))
            ts = []
            for rep in range(reps):
                v, c = cams(n, salt=0.1 * rep + 0.013 * n)
                t0 = time.time()
                float(run_chain(v, c, groups, n))
                ts.append(time.time() - t0)
            return float(np.median(ts))

        n = 4
        t1 = time_chain(1)
        tn = time_chain(n)
        frame_ms = max(tn - t1, 1e-6) / (n - 1) * 1e3
        mrays = (W * H / 1e6) / (frame_ms / 1e3)
        print(json.dumps({
            "metric": f"rt_wavefront_{builder}_1080p_fps",
            "value": round(1000.0 / frame_ms, 3),
            "frame_ms": round(frame_ms, 2),
            "mrays_per_s": round(mrays, 2),
            "bvh_build_s": round(t_build, 2),
            "unit": "frames/s",
            "vs_baseline": round(1000.0 / frame_ms / 30.0, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
