"""Per-stage timing of the RTAO path at 960x540, 4 spp (bench config).

Splits the frame into:
  1. primary raster G-buffer (capsule kernel + unpack)
  2. ray generation (cosine hemisphere + pair expansion + cell sort)
  3. the Pallas pair-trace kernel
  4. the final per-ray scatter-max + shading
so the Mrays/s optimization targets the real bottleneck. axon-aware
timing: distinct inputs per rep, one forced scalar readback each.
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
from functools import partial

from linevis_tpu.core.trajectories import (
    normalize_attributes,
    normalize_trajectories,
)
from linevis_tpu.kernels.ao_grid import (
    build_segment_grid,
    trace_ao_occlusion,
)
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.rtao import (
    RtaoSettings,
    _cosine_hemisphere,
    render_tubes_rtao,
)
from linevis_tpu.render.tube_raster import (
    _proj_constants,
    build_capsule_scene,
    prepare_capsule_frame,
)
from linevis_tpu.kernels.raster_capsule import rasterize_capsules_pallas
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
    Wr, Hr = 960, 540
    traj = trace_streamlines(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=512, max_steps=400,
                                  dt=1.0 / 150.0),
    )
    traj = normalize_attributes(normalize_trajectories(traj))
    scene = build_capsule_scene(
        traj.positions, traj.mask, traj.attributes[:, 0], radius=0.0015
    )
    rtao = RtaoSettings(num_samples=4)
    grid = build_segment_grid(
        scene.a, scene.ba, scene.radius, scene.mask,
        resolution=rtao.grid_resolution,
    )
    cam = Camera(position=(0.0, 0.1, 1.2), width=Wr, height=Hr)
    ab = jnp.asarray(_proj_constants(cam))
    settings = RasterSettings(width=Wr, height=Hr, tile_w=32, tile_h=16)

    def cams(i):
        c = cam.orbit(0.002 * (i + 1), 0.1, 1.2)
        return (
            jnp.asarray(np.asarray(c.view_projection_matrix())),
            jnp.asarray(np.asarray(c.position, np.float32)),
        )

    # Stage 1: primary raster.
    @jax.jit
    def stage_raster(vp, cp):
        csr, params, basis = prepare_capsule_frame(
            scene, vp, cp, ab, settings
        )
        return rasterize_capsules_pallas(
            csr, params, Wr, Hr, settings.tile_w, settings.tile_h,
            use_aa=False,
        )

    print(f"raster G-buffer:     {timeit(stage_raster, cams):8.1f} ms")

    # Stage 2+3+4 split: ray gen vs trace. Use a fixed fake G-buffer so the
    # stage is isolated (origins on a sphere shell, normals outward).
    R = Wr * Hr * rtao.num_samples
    k0 = jax.random.PRNGKey(7)
    n0 = jax.random.normal(k0, (3, Hr, Wr))
    n0 = n0 / jnp.linalg.norm(n0, axis=0, keepdims=True)

    @jax.jit
    def stage_raygen(vp, cp, seed):
        key = jax.random.PRNGKey(seed)
        dirs = _cosine_hemisphere(key, n0, rtao.num_samples)
        pos = cp[:, None, None] + n0 * 0.4
        origins = pos[None] + n0[None] * (2.0 * scene.radius)
        o_flat = jnp.broadcast_to(
            origins, (rtao.num_samples, 3, Hr, Wr)
        ).transpose(1, 0, 2, 3).reshape(3, -1)
        d_flat = dirs.transpose(1, 0, 2, 3).reshape(3, -1)
        return o_flat, d_flat

    def mk(i):
        vp, cp = cams(i)
        return (vp, cp, i)

    print(f"ray gen (hemis):     {timeit(stage_raygen, mk):8.1f} ms")

    @jax.jit
    def stage_full_trace(vp, cp, seed):
        o_flat, d_flat = stage_raygen(vp, cp, seed)
        t_max = jnp.full((R,), rtao.ao_radius, jnp.float32)
        valid = jnp.ones((R,), bool)
        return trace_ao_occlusion(
            o_flat, d_flat, t_max, valid, grid,
            max_ray_cells=rtao.max_ray_cells,
        )

    t_trace = timeit(stage_full_trace, mk)
    print(f"raygen+sort+trace:   {t_trace:8.1f} ms"
          f"  ({R / t_trace / 1e3:.1f} Mrays/s)")

    # Kernel-only: fixed pre-sorted pairs, only _trace_pairs re-runs.
    from linevis_tpu.kernels import ao_grid as AG

    o_flat, d_flat = jax.jit(stage_raygen)(*cams(0), 0)
    t_max = jnp.full((R,), rtao.ao_radius, jnp.float32)
    valid = jnp.ones((R,), bool)
    G = grid.resolution
    C = grid.chunk
    M = rtao.max_ray_cells
    ts_lin = jnp.linspace(0.0, 1.0, M, dtype=jnp.float32)
    p = o_flat[:, None, :] + d_flat[:, None, :] * (
        ts_lin[None, :, None] * t_max[None, None, :]
    )
    cc = jnp.clip(
        jnp.floor((p - grid.origin[:, None, None])
                  * grid.inv_cell[:, None, None]).astype(jnp.int32),
        0, G - 1,
    )
    cell = (cc[2] * G + cc[1]) * G + cc[0]
    prev = jnp.concatenate(
        [jnp.full((1, R), -1, jnp.int32), cell[:-1]], axis=0
    )
    cell = jnp.where(cell == prev, G * G * G, cell)
    counts_of = grid.cell_count[jnp.clip(cell, 0, G * G * G - 1)]
    cell = jnp.where((cell < G * G * G) & (counts_of > 0), cell, G * G * G)
    n_pairs = M * R
    key = cell.reshape(-1)
    ray_rows = jnp.concatenate(
        [o_flat, d_flat, t_max[None], jnp.zeros((1, R), jnp.float32)], axis=0
    )
    rows_b = jnp.broadcast_to(
        ray_rows[:, None, :], (8, M, R)
    ).reshape(8, n_pairs)
    ops = (key,) + tuple(rows_b[i] for i in range(8))
    sorted_ops = jax.lax.sort(ops, dimension=-1, is_stable=True, num_keys=1)
    skeys = sorted_ops[0]
    rays_sorted = jnp.stack(sorted_ops[1:], axis=0)
    n_pairs_pad = -(-n_pairs // C) * C
    pad = n_pairs_pad + C - n_pairs
    rays_sorted = jnp.pad(rays_sorted, ((0, 0), (0, pad)))
    skeys_p = jnp.pad(skeys, (0, pad), constant_values=G * G * G)
    n_chunks = n_pairs_pad // C
    first_cell = jnp.clip(skeys_p.reshape(-1, C)[:n_chunks, 0], 0,
                          G * G * G - 1)
    last_cell = jnp.clip(skeys_p.reshape(-1, C)[:n_chunks, C - 1], 0,
                         G * G * G - 1)
    s_begin = grid.cell_start[first_cell]
    s_end = grid.cell_start[last_cell] + grid.cell_count[last_cell]
    begin_floor = (s_begin // C) * C
    seg_chunks = jnp.where(
        s_end > s_begin, (s_end - begin_floor + C - 1) // C, 0
    )
    print("pairs:", n_pairs, "live:", int(jnp.sum(key < G * G * G)),
          "chunks:", n_chunks,
          "seg-chunks sum:", int(jnp.sum(seg_chunks)))
    rays_sorted, begin_floor, seg_chunks = jax.block_until_ready(
        (rays_sorted, begin_floor, seg_chunks))

    def mk_trace(i):
        # Perturb tmax row (row 6) slightly so axon cannot dedupe.
        rs = rays_sorted.at[7, :].set(float(i) * 1e-6)
        return (rs, begin_floor, seg_chunks, grid.records)

    def trace_only(rs, bf, sc, rec):
        return AG._trace_pairs(rs, bf, sc, rec, C, False)

    t_k = timeit(trace_only, mk_trace)
    print(f"trace kernel only:   {t_k:8.1f} ms"
          f"  ({R / t_k / 1e3:.1f} Mrays/s)")

    # Full frame for reference.
    def mkf(i):
        vp, cp = cams(i)
        return (scene, vp, cp, ab)

    full = partial(render_tubes_rtao, settings=settings, rtao=rtao, grid=grid)
    t_full = timeit(full, mkf)
    print(f"full RTAO frame:     {t_full:8.1f} ms"
          f"  ({R / t_full / 1e3:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
