"""Per-stage timing of the capsule raster path at 800x600 and 1080p.

Measures (on the real TPU, axon-aware):
  1. prepare_capsule_frame (project + payload + sort binning) alone
  2. the Pallas capsule kernel alone (fixed binning)
  3. full frame end-to-end
Each timed loop varies inputs per iteration (axon dedupes identical
computations) and forces a scalar readback (lazy dispatch).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from functools import partial

from linevis_tpu.core.trajectories import (
    normalize_attributes,
    normalize_trajectories,
)
from linevis_tpu.kernels.raster_capsule import rasterize_capsules_pallas
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.tube_raster import (
    _proj_constants,
    build_capsule_scene,
    prepare_capsule_frame,
    render_tubes,
)
from linevis_tpu.trace.fields import tornado_velocity
from linevis_tpu.trace.streamline import (
    StreamlineTracingSettings,
    trace_streamlines,
)


def timeit(fn, make_args, n=8):
    # warmup
    out = fn(*make_args(0))
    jax.tree.map(
        lambda x: float(jnp.sum(x.ravel()[::1000])) if hasattr(x, "ravel") else x,
        out,
    )
    ts = []
    for i in range(n):
        args = make_args(i + 1)
        t0 = time.time()
        out = fn(*args)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")]
        float(jnp.sum(leaves[0].ravel()[::1000]))
        ts.append(time.time() - t0)
    return np.asarray(ts)


def stats(ts):
    return (f"avg {np.mean(ts)*1e3:7.1f} ms  p5 {np.percentile(ts,5)*1e3:7.1f}"
            f"  p95 {np.percentile(ts,95)*1e3:7.1f}  min {ts.min()*1e3:7.1f}")


def main():
    print("devices:", jax.devices())
    traj = trace_streamlines(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=512, max_steps=400, dt=1.0 / 150.0),
    )
    traj = normalize_attributes(normalize_trajectories(traj))
    scene = build_capsule_scene(
        traj.positions, traj.mask, traj.attributes[:, 0], radius=0.0015
    )
    print("segments:", scene.num_segments)

    for W, H in ((800, 600), (1920, 1080)):
        print(f"=== {W}x{H}")
        cam = Camera(position=(0.0, 0.1, 1.2), width=W, height=H)
        S = RasterSettings(width=W, height=H, tile_w=32, tile_h=16)
        ab = jnp.asarray(_proj_constants(cam))

        def cam_args(i):
            c = cam.orbit(0.002 * i, 0.1, 1.2)
            return (
                jnp.asarray(c.view_projection_matrix()),
                jnp.asarray(np.asarray(c.position, np.float32)),
            )

        prep = jax.jit(partial(prepare_capsule_frame, settings=S))

        def prep_args(i):
            vp, cp = cam_args(i)
            return (scene, vp, cp, ab)

        ts = timeit(lambda *a: prep(*a), prep_args)
        print("  binning (prepare_capsule_frame):", stats(ts))

        csr, params, _ = prep(scene, *cam_args(0), ab)
        csr = jax.tree.map(
            lambda x: x if not hasattr(x, "block_until_ready") else x, csr
        )
        kern = partial(
            rasterize_capsules_pallas, width=W, height=H,
            tile_w=S.tile_w, tile_h=S.tile_h,
        )

        def kern_args(i):
            # vary params slightly so axon can't dedupe
            return (csr, params.at[13].set(1e-6 * i))

        ts = timeit(lambda c, p: kern(c, p), kern_args)
        print("  pallas capsule kernel:          ", stats(ts))

        full = partial(render_tubes, settings=S)

        def full_args(i):
            vp, cp = cam_args(i)
            return (scene, vp, cp, ab)

        ts = timeit(lambda *a: full(*a), full_args)
        print("  full frame:                     ", stats(ts))


if __name__ == "__main__":
    main()
