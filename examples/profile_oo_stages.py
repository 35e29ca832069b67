"""Stage split of the opacity-optimization frame at 1080p (cfg5).

Chain-timed per stage (each stage's chain subtracts a 1-frame run, so
tunnel latency cancels — same protocol as bench.py):
  solve  = half-res importance gather + Algorithm-1 + smoothing
  final  = full-res MLAB render with the solved per-vertex alphas
  full   = solve + final carried through a fori_loop (the cfg5 config)

Reference role: `OpacityOptimizationRenderer.cpp:686-719` (gather pass,
opacity solve, smoothing passes, final render).

    PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_oo_stages.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from linevis_tpu.core.trajectories import (
    normalize_attributes,
    normalize_trajectories,
)
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.opacity_optimization import (
    OpacityOptimizationSettings,
    _final_render,
    _opacity_solve,
)
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.tube_raster import (
    _proj_constants,
    build_capsule_scene,
)
from linevis_tpu.trace.fields import tornado_velocity
from linevis_tpu.trace.streamline import (
    StreamlineTracingSettings,
    trace_streamlines,
)


def main():
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
    oo = OpacityOptimizationSettings()
    L, P = traj.positions.shape[0], traj.positions.shape[1]

    def cams(n, salt=0.0):
        vps, cps = [], []
        for i in range(n):
            c = cam.orbit(0.002 * (i + 1) + salt, 0.1, 1.2)
            vps.append(np.asarray(c.view_projection_matrix()))
            cps.append(np.asarray(c.position, np.float32))
        return jnp.asarray(np.stack(vps)), jnp.asarray(np.stack(cps))

    @jax.jit
    def chain_solve(vps, cps, n):
        def body(i, vo):
            return _opacity_solve(
                scene, vps[i], cps[i], ab, vo, settings, oo, L, P
            )
        return jnp.sum(
            jax.lax.fori_loop(0, n, body, jnp.ones((L, P), jnp.float32))
        )

    @jax.jit
    def chain_final(vps, cps, n):
        vo = jnp.ones((L, P), jnp.float32) * 0.7

        def body(i, acc):
            img = _final_render(
                scene, vps[i], cps[i], ab, vo, settings, oo.render_k
            )
            return acc + jnp.sum(img[0, ::97, ::101])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def chain_full(vps, cps, n):
        def body(i, state):
            acc, vo = state
            vo = _opacity_solve(
                scene, vps[i], cps[i], ab, vo, settings, oo, L, P
            )
            img = _final_render(
                scene, vps[i], cps[i], ab, vo, settings, oo.render_k
            )
            return (acc + jnp.sum(img[0, ::97, ::101]), vo)

        init = (jnp.float32(0.0), jnp.ones((L, P), jnp.float32))
        return jax.lax.fori_loop(0, n, body, init)[0]

    def time_chain(fn, n=6, reps=3):
        float(fn(*cams(n, salt=0.9), jnp.int32(n)))  # compile/warm
        t1s, tns = [], []
        for rep in range(reps):
            v, c = cams(n, salt=0.1 * rep + 0.029)
            t0 = time.time()
            float(fn(v, c, jnp.int32(1)))
            t1s.append(time.time() - t0)
            v, c = cams(n, salt=0.1 * rep + 0.51)
            t0 = time.time()
            float(fn(v, c, jnp.int32(n)))
            tns.append(time.time() - t0)
        return (float(np.median(tns)) - float(np.median(t1s))) / (n - 1) * 1e3

    out = {}
    out["solve_ms"] = round(time_chain(chain_solve), 2)
    print(json.dumps({"stage": "solve", "ms": out["solve_ms"]}), flush=True)
    out["final_ms"] = round(time_chain(chain_final), 2)
    print(json.dumps({"stage": "final", "ms": out["final_ms"]}), flush=True)
    out["full_ms"] = round(time_chain(chain_full), 2)
    out["full_fps"] = round(1000.0 / out["full_ms"], 2)
    print(json.dumps({"metric": "cfg5_stage_split", **out,
                      "unit": "ms", "vs_baseline": out["full_fps"] / 30.0}),
          flush=True)


if __name__ == "__main__":
    main()
