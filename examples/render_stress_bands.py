"""Config-4 style demo: synthetic v3 PSL scene with bands + hull.

Builds a femur-like synthetic v3 stress .dat (three PS directions, band
strands, hull), loads it through LineDataStress, renders the three band
modes opaque and writes PNGs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    # Main-only: tests import synth_v3_blocks from this module, and enabling
    # the persistent cache in pytest pollutes the TPU bench cache with CPU
    # executables (and one cache write aborted a full suite run).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

from linevis_tpu.core.trajectories import RaggedTrajectories
from linevis_tpu.loaders.stress_dat import (
    RaggedStressTrajectories,
    SimulationMeshHull,
    write_stress_trajectories_dat_v3,
)
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.framebuffer import save_png
from linevis_tpu.render.opaque import render_opaque_image
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.scene.line_data_stress import LineDataStress


def synth_v3_blocks(rng, lines_per_ps=24, n=48):
    """Three PS families of helical lines on a bone-like capsule volume."""
    blocks = []
    for ps in range(3):
        block = RaggedStressTrajectories(
            trajectories=RaggedTrajectories([], [], []), ps_index=ps
        )
        for li in range(lines_per_ps):
            t = np.linspace(0, 1, n, dtype=np.float32)
            phase = rng.uniform(0, 2 * np.pi)
            z = t * 2.0 - 1.0
            r = 0.35 + 0.1 * np.cos(3 * np.pi * z)
            if ps == 0:  # major: longitudinal
                ang = phase + 0.8 * t
                pos = np.stack([r * np.cos(ang), r * np.sin(ang), z], 1)
            elif ps == 1:  # medium: helical
                ang = phase + 6.0 * t
                pos = np.stack([r * np.cos(ang), r * np.sin(ang), z * 0.8], 1)
            else:  # minor: hoops
                ang = phase + 2 * np.pi * t
                zz = np.full_like(t, rng.uniform(-0.9, 0.9))
                rr = 0.35 + 0.1 * np.cos(3 * np.pi * zz)
                pos = np.stack([rr * np.cos(ang), rr * np.sin(ang), zz], 1)
            pos = pos.astype(np.float32)
            block.trajectories.positions.append(pos)
            # Right vector: radial direction (band plane tangent to surface).
            right = pos.copy()
            right[:, 2] = 0
            nrm = np.maximum(np.linalg.norm(right, axis=1, keepdims=True), 1e-5)
            right = (right / nrm).astype(np.float32)
            block.band_points_left.append(-right)
            block.band_points_right.append(right)
            block.band_points_left_unsmoothed.append(-right)
            block.band_points_right_unsmoothed.append(right)
            attrs = np.zeros((9, n), np.float32)
            sigma = (1.0 - np.abs(z)) * (3 - ps)  # principal stress
            attrs[0] = sigma
            attrs[1] = np.abs(sigma)
            attrs[2] = np.abs(sigma) * 0.9  # von Mises
            attrs[3:6] = rng.normal(0, 0.3, (3, n)).astype(np.float32) + sigma
            attrs[6:9] = rng.normal(0, 0.2, (3, n)).astype(np.float32)
            block.trajectories.attributes.append(attrs)
            block.hierarchy_levels.append(
                [float(np.abs(sigma).mean() / 3.0)] * 4
            )
            block.appearance_orders.append(li)
            block.seed_positions.append(pos[0])
        blocks.append(block)
    return blocks


def main():
    rng = np.random.default_rng(42)
    blocks = synth_v3_blocks(rng)
    theta = np.linspace(0, 2 * np.pi, 17, dtype=np.float32)[:-1]
    ring = np.stack(
        [0.5 * np.cos(theta), 0.5 * np.sin(theta), 0 * theta - 1], 1
    )
    top = ring.copy()
    top[:, 2] = 1
    verts = np.concatenate([ring, top]).astype(np.float32)
    k = len(theta)
    quads = [[i, (i + 1) % k, k + (i + 1) % k, k + i] for i in range(k)]
    tris = []
    for q in quads:
        tris.append([q[0], q[1], q[2]])
        tris.append([q[0], q[2], q[3]])
    hull = SimulationMeshHull(
        vertices=verts, triangles=np.array(tris, np.int32)
    )

    os.makedirs("out", exist_ok=True)
    path = "out/synthetic_femur_v3.dat"
    write_stress_trajectories_dat_v3(path, blocks, hull)
    data = LineDataStress.load_from_dat([path], version=3)
    print(
        f"loaded v3: {len(data.trajectories_ps)} PS sets, bands={data.use_bands}, "
        f"hull verts={data.hull.vertices.shape[0]}, "
        f"attrs={len(data.attribute_names)}"
    )
    data.set_hierarchy_slider(2, 0.1)

    cam = Camera(position=(0.9, 0.7, 1.1), look_at_point=(0, 0, 0), width=800,
                 height=600)
    for mode in ("RIBBONS", "EIGENVALUE_RATIO", "HYPERSTREAMLINES"):
        data.set_band_render_mode(mode)
        mesh = data.get_band_tube_mesh(
            band_width=0.012 if mode != "HYPERSTREAMLINES" else 0.012,
            num_subdivisions=8,
        )
        img = render_opaque_image(
            mesh, cam,
            settings=RasterSettings(width=800, height=600, tile_w=32,
                                    tile_h=16),
        )
        out = f"out/stress_bands_{mode.lower()}.png"
        save_png(out, img)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
