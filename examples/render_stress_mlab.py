"""Config 4 analogue: multi-direction principal stress lines + MLAB OIT.

Generates a synthetic PSL dataset (three orthogonal line families, like a
cantilever's principal stress topology), writes it through the v1 .dat
format, loads it via LineDataStress (exercising the real loader), and
renders with per-direction selection + MLAB transparency.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from linevis_tpu.render.camera import Camera
from linevis_tpu.render.renderer import create_renderer
from linevis_tpu.render.framebuffer import save_png
from linevis_tpu.scene.line_data_stress import LineDataStress


def synth_psl_dat(path: str, n_per_dir=40, n_pts=48):
    """Write a synthetic 3-direction PSL .dat (v1 format)."""
    rng = np.random.default_rng(7)
    blocks = []
    for ps, name in enumerate(("major", "medium", "minor")):
        lines = []
        for i in range(n_per_dir):
            t = np.linspace(0, 1, n_pts)
            u = (i + 0.5) / n_per_dir - 0.5
            v = rng.uniform(-0.45, 0.45)
            if ps == 0:  # arcs in the x-y plane
                x = t - 0.5
                y = u + 0.15 * np.sin(np.pi * t) * (1 - 2 * abs(u))
                z = v * np.ones_like(t)
            elif ps == 1:  # arcs in y-z
                x = v * np.ones_like(t)
                y = t - 0.5
                z = u + 0.15 * np.sin(np.pi * t) * (1 - 2 * abs(u))
            else:  # straight-ish in z
                x = u * np.ones_like(t) + 0.05 * np.sin(2 * np.pi * t)
                y = v * np.ones_like(t)
                z = t - 0.5
            lines.append(np.stack([x, y, z], -1))
        blocks.append((name, lines))

    with open(path, "w") as f:
        for name, lines in blocks:
            f.write(f"{name} {len(lines)}\n")
            for pts in lines:
                n = len(pts)
                f.write(f"{n}\n")
                f.write(" ".join(f"{v:.6f}" for v in pts.reshape(-1)) + "\n")
                # 12 PS floats per point: sigma+dir x3 (synthetic magnitudes)
                ps_vals = []
                for j in range(n):
                    s = 1.0 + j / n
                    ps_vals += [3 * s, 1, 0, 0, 2 * s, 0, 1, 0, s, 0, 0, 1]
                f.write(" ".join(f"{v:.4f}" for v in ps_vals) + "\n")
                vm = [(1.0 + j / n) * 5.0 for j in range(n)]
                f.write(" ".join(f"{v:.4f}" for v in vm) + "\n")


def main():
    os.makedirs("out", exist_ok=True)
    dat = "out/synth_psl.dat"
    synth_psl_dat(dat)
    lds = LineDataStress.load_from_dat([dat], name="synthetic cantilever")
    lds.set_line_width(0.006)
    print(f"loaded {len(lds.trajectories_ps)} PS directions, "
          f"{lds.num_lines} lines, {lds.num_line_segments} segments")

    cam = Camera(position=(0.9, 0.7, 1.1), width=800, height=600)
    renderer = create_renderer("Multi-Layer Alpha Blending")
    renderer.set_line_data(lds)

    t0 = time.time()
    img = renderer.render(cam)
    print(f"first frame: {time.time()-t0:.1f}s")
    save_png("out/stress_mlab.png", img)

    # Per-direction selection (reference usedPsDirections).
    lds.set_used_ps_directions([True, False, False])
    img2 = renderer.render(cam)
    save_png("out/stress_major_only.png", img2)
    print("wrote out/stress_mlab.png, out/stress_major_only.png")


if __name__ == "__main__":
    main()
