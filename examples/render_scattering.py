"""Scattering pipeline demo: trace -> density field -> DVR + heat map + VPT.

Mirrors the reference's LineDataScattering flow (`ScatteringLineTracing
Requester` -> `LineDataScattering` -> Line Density Map / Spherical Heat
Map / Volumetric Path Tracer renderers).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

from linevis_tpu.render.camera import Camera
from linevis_tpu.render.framebuffer import save_png
from linevis_tpu.render.renderer import create_renderer
from linevis_tpu.render.vpt import VptSettings
from linevis_tpu.scene.line_data_scattering import LineDataScattering
from linevis_tpu.trace.scattering import ScatteringTracingSettings


def main():
    os.makedirs("out", exist_ok=True)
    # Procedural cloud block (the reference test's createCloudBlock role).
    res = 32
    g = np.zeros((res, res, res), np.float32)
    q = res // 4
    g[q:-q, q:-q, q:-q] = 0.8

    t0 = time.time()
    ld = LineDataScattering.trace(
        g,
        ScatteringTracingSettings(
            res_x=6, res_y=6, samples_per_pixel=4,
            extinction=(512.0,) * 3, g=0.3, max_events=96, seed=11,
        ),
    )
    print(f"traced {ld.num_lines} scattered paths "
          f"({ld.num_line_points} events) in {time.time()-t0:.1f}s")

    cam = Camera(position=(0.0, 0.15, 1.0), look_at_point=(0, 0, 0),
                 width=400, height=300)

    for mode, name in (
        ("Line Density Map Renderer", "scattering_density_dvr"),
        ("Spherical Heat Map Renderer", "scattering_heatmap"),
        ("Opaque", "scattering_lines"),
    ):
        r = create_renderer(mode)
        r.set_line_data(ld)
        t0 = time.time()
        img = r.render(cam)
        print(f"{mode}: {time.time()-t0:.1f}s -> out/{name}.png")
        save_png(f"out/{name}.png", img)

    vpt = create_renderer("Volumetric Path Tracer")
    vpt.set_line_data(ld)
    vpt.vpt = VptSettings(extinction=(100.0,) * 3, max_events=128,
                          samples_per_frame=2)
    t0 = time.time()
    for _ in range(4):  # accumulate
        img = vpt.render(cam)
    print(f"VPT 4 frames: {time.time()-t0:.1f}s -> out/scattering_vpt.png")
    save_png("out/scattering_vpt.png", img)


if __name__ == "__main__":
    main()
