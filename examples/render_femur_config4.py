"""Config-4 demo: synthetic Femur-like v3 PSL scene — MLAB lines,
hierarchy mapping curve, degenerate points, transparent hull.

BASELINE.json config 4 is "Femur (3D-TSV) PSLs — MLAB/moment-based OIT";
no real Femur .dat ships with either repo, so the scene is the synthetic
v3 fixture (three PS families + hull) from examples/render_stress_bands.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import dataclasses

import jax.numpy as jnp
import numpy as np

from examples.render_stress_bands import synth_v3_blocks
from linevis_tpu.loaders.stress_dat import (
    SimulationMeshHull,
    write_stress_trajectories_dat_v3,
)
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.framebuffer import save_png
from linevis_tpu.render.oit import render_tubes_mboit, render_tubes_mlab
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.surface import render_surface_image
from linevis_tpu.render.tube_raster import _proj_constants
from linevis_tpu.scene.line_data_stress import LineDataStress


def composite_over(front: np.ndarray, back: np.ndarray) -> np.ndarray:
    """front OVER back for straight-alpha [H, W, 4] images."""
    fa = front[..., 3:4]
    rgb = front[..., :3] * fa + back[..., :3] * (1.0 - fa)
    a = fa[..., 0] + back[..., 3] * (1.0 - fa[..., 0])
    return np.concatenate([rgb, a[..., None]], axis=-1)


def main():
    os.makedirs("out", exist_ok=True)
    rng = np.random.default_rng(42)
    blocks = synth_v3_blocks(rng, lines_per_ps=24, n=48)
    theta = np.linspace(0, 2 * np.pi, 17, dtype=np.float32)[:-1]
    ring = np.stack([0.5 * np.cos(theta), 0.5 * np.sin(theta),
                     0 * theta - 1], 1)
    top = ring.copy(); top[:, 2] = 1
    verts = np.concatenate([ring, top]).astype(np.float32)
    k = len(theta)
    tris = []
    for i in range(k):
        q = [i, (i + 1) % k, k + (i + 1) % k, k + i]
        tris += [[q[0], q[1], q[2]], [q[0], q[2], q[3]]]
    hull = SimulationMeshHull(vertices=verts,
                              triangles=np.array(tris, np.int32))
    path = "out/synthetic_femur_v3.dat"
    write_stress_trajectories_dat_v3(path, blocks, hull)
    ld = LineDataStress.load_from_dat([path], version=3)
    ld.set_line_width(0.006)
    ld.set_hierarchy_mapping_curve(0, [(0.0, 0.2), (1.0, 1.0)])
    ld.set_show_degenerate_points(False)
    print(f"{len(ld.trajectories_ps)} PS sets, "
          f"{ld.num_line_segments} segments, hull "
          f"{ld.hull.vertices.shape[0]} verts")

    W, H = 800, 600
    cam = Camera(position=(0.9, 0.7, 1.1), look_at_point=(0, 0, 0),
                 width=W, height=H)
    S = RasterSettings(width=W, height=H, tile_w=16, tile_h=8,
                       depth_cue_strength=0.2)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    scene = ld.get_capsule_scene()
    seg_alpha = jnp.asarray(ld.get_segment_opacity_rows())

    t0 = time.time()
    lines = np.moveaxis(np.asarray(render_tubes_mlab(
        scene, vp, cp, ab, S, K=8, opacity=0.8, seg_alpha=seg_alpha,
    )), 0, -1)
    print(f"MLAB lines: {time.time()-t0:.1f}s")

    t0 = time.time()
    mboit = np.moveaxis(np.asarray(render_tubes_mboit(
        scene, vp, cp, ab, S, n_mom=4, opacity=0.3,
    )), 0, -1)
    print(f"MBOIT lines: {time.time()-t0:.1f}s")
    save_png("out/femur_mboit.png", mboit)

    # Transparent hull (front surface; the reference renders the hull in
    # the same OIT pass — front-surface OVER is the dominant term for an
    # enclosing hull at alpha 0.3).
    hull_surface = ld.get_hull_surface()
    S_hull = dataclasses.replace(
        S, span_x=6, span_y=8,
        tf_color=((0.0,) + LineDataStress.HULL_COLOR_LINEAR,
                  (1.0,) + LineDataStress.HULL_COLOR_LINEAR),
        tf_opacity=((0.0, LineDataStress.HULL_OPACITY),
                    (1.0, LineDataStress.HULL_OPACITY)),
        background_color=(1.0, 1.0, 1.0, 0.0),
    )
    t0 = time.time()
    hull_img = render_surface_image(hull_surface, cam, settings=S_hull)
    # Background pixels carry alpha 0; hull pixels alpha 0.3.
    print(f"hull pass: {time.time()-t0:.1f}s")

    final = composite_over(hull_img, lines)
    save_png("out/femur_config4.png", final)
    print("wrote out/femur_config4.png, out/femur_mboit.png")


if __name__ == "__main__":
    main()
