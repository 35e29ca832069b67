"""Stage split of the MLAB frame at 1080p: binning vs kernel vs resolve.

    PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_mlab_stages.py
"""

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
from linevis_tpu.kernels.raster_capsule_oit import rasterize_capsules_mlab
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.oit import render_tubes_mlab, shade_deferred_nodes
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.tube_raster import (
    _proj_constants,
    build_capsule_scene,
    prepare_capsule_frame,
)
from linevis_tpu.trace.fields import tornado_velocity
from linevis_tpu.trace.streamline import (
    StreamlineTracingSettings,
    trace_streamlines,
)


def timeit(fn, make_args, n=6):
    out = fn(*make_args(0))
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")]
    float(jnp.sum(leaves[0].ravel()[::1001].astype(jnp.float32)))
    ts = []
    for i in range(n):
        args = make_args(i + 1)
        t0 = time.time()
        out = fn(*args)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")]
        float(jnp.sum(leaves[0].ravel()[::1001].astype(jnp.float32)))
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def main():
    print("devices:", jax.devices())
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
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8)
    ab = jnp.asarray(_proj_constants(cam))

    def cams(i):
        c = cam.orbit(0.002 * (i + 1), 0.1, 1.2)
        return (jnp.asarray(np.asarray(c.view_projection_matrix())),
                jnp.asarray(np.asarray(c.position, np.float32)))

    @jax.jit
    def stage_prepare(vp, cp):
        return prepare_capsule_frame(scene, vp, cp, ab, S)

    t_prep = timeit(stage_prepare, cams)
    print(f"prepare (project+bin+sort): {t_prep:8.1f} ms")

    # Fixed binning, kernel only (perturb params row 23 to defeat dedupe).
    csr, params, _ = jax.jit(stage_prepare)(*cams(0))
    csr, params = jax.block_until_ready((csr, params))

    def mk_kernel(i):
        return (csr, params.at[23].set(float(i) * 1e-7))

    def run_kernel(csr, params):
        return rasterize_capsules_mlab(
            csr, params, W, H, S.tile_w, S.tile_h, 8,
            S.tf_color, S.tf_opacity, deferred_shade=True,
        )

    t_kern = timeit(run_kernel, mk_kernel)
    print(f"MLAB kernel (K=8):          {t_kern:8.1f} ms")

    def mkf(i):
        vp, cp = cams(i)
        return (scene, vp, cp, ab)

    from functools import partial

    full = partial(render_tubes_mlab, settings=S, K=8, opacity=0.3)
    t_full = timeit(full, mkf)
    print(f"full MLAB frame:            {t_full:8.1f} ms")
    print(f"resolve/shade (derived):    {t_full - t_kern - t_prep:8.1f} ms")


if __name__ == "__main__":
    main()
