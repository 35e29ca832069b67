"""Measured geometry-parity study: analytic capsules vs reference tubes.

The reference rasterizes tubes as 8-subdivision triangle meshes
(`/root/reference/src/Renderers/Tubes/Tubes.hpp:40`,
`src/LineData/LineData.hpp:374-386` tubeNumSubdivisions = 8); this repo's
flagship path renders analytic capsules (linear-swept spheres — the
reference's own RT geometry, `VulkanRayTracer.hpp:53-63`). This script
MEASURES the silhouette delta instead of arguing it
(docs/SSIM_GAP_ANALYSIS.md §3): every round-tube golden scene is rendered
both ways at 1080p through the SAME shading (Blinn-Phong tube lighting,
TF, depth cues) and the SSIM between the two is reported.

Both images are rendered at 2x supersampling and box-downsampled so the
comparison isolates the geometric silhouette (polygonal vs round cross
section, facet normals vs exact normals) rather than the two paths' edge
AA models (analytic coverage vs none).

    PYTHONPATH=/root/repo:$PYTHONPATH python examples/geometry_parity_ssim.py

Writes docs/GEOMETRY_PARITY.json + prints a per-scene table. The gate
(>= 0.99 SSIM, the BASELINE.json north star applied to the one geometry
substitution this environment can measure) is asserted by
tests/test_geometry_parity.py.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parity_scenes():
    """Round-tube scenes rendered by both geometry paths.

    Returns {name: (positions [L,P,3], mask [L,P], attrs [L,P], radius)}.
    """
    import numpy as np

    from linevis_tpu.core.trajectories import (
        normalize_attributes,
        normalize_trajectories,
    )
    from linevis_tpu.trace.fields import tornado_velocity
    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamlines,
    )

    scenes = {}

    traj = trace_streamlines(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=256, max_steps=300,
                                  dt=1.0 / 150.0),
    )
    traj = normalize_attributes(normalize_trajectories(traj))
    scenes["tornado"] = (traj.positions, traj.mask, traj.attributes[:, 0],
                         0.0015)

    import jax.numpy as jnp

    def convection(p, time=0.0):
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        k = 2.0 * np.pi
        vx = jnp.sin(k * x) * jnp.cos(k * y)
        vy = -jnp.cos(k * x) * jnp.sin(k * y)
        vz = 0.3 * jnp.sin(k * x) * jnp.sin(k * z)
        return jnp.stack([vx, vy, vz], axis=-1)

    traj = trace_streamlines(
        convection,
        StreamlineTracingSettings(num_seeds=192, max_steps=250,
                                  dt=1.0 / 120.0),
    )
    traj = normalize_attributes(normalize_trajectories(traj))
    scenes["convection"] = (traj.positions, traj.mask,
                            traj.attributes[:, 0], 0.002)

    # Helical bundle: strong curvature + coherent tangents (worst case for
    # facet normals on the triangle tube).
    L, P = 48, 160
    t = np.linspace(0.0, 4.0 * np.pi, P, dtype=np.float32)
    pos = np.zeros((L, P, 3), np.float32)
    rng = np.random.default_rng(3)
    for i in range(L):
        r0 = 0.12 + 0.3 * (i / L)
        ph = rng.uniform(0, 2 * np.pi)
        pos[i, :, 0] = r0 * np.cos(t + ph)
        pos[i, :, 1] = (t / (4 * np.pi) - 0.5) * 0.9
        pos[i, :, 2] = r0 * np.sin(t + ph)
    mask = np.ones((L, P), bool)
    attrs = np.broadcast_to(
        np.linspace(0, 1, P, dtype=np.float32)[None], (L, P)
    ).copy()
    scenes["helix"] = (pos, mask, attrs, 0.004)
    return scenes


def render_pair(pos, mask, attrs, radius, width, height, ss=2):
    """(capsule image, triangle-tube image) [H, W, 4], both 2x SSAA."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from linevis_tpu.geometry.tubes import build_tube_triangle_mesh
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.opaque import render_opaque_image
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.transfer_function import TransferFunction
    from linevis_tpu.render.tube_raster import (
        build_capsule_scene,
        build_prism_scene,
        render_tubes_image,
        render_tubes_prism_image,
    )

    cam = Camera(position=(0.0, 0.1, 1.2), look_at_point=(0.0, 0.0, 0.0),
                 width=width, height=height)
    tf = TransferFunction.standard()
    # use_aa off: supersampling provides the AA for BOTH paths identically.
    settings = RasterSettings(width=width, height=height, tile_w=32,
                              tile_h=16, aa=False)

    scene = build_capsule_scene(pos, mask, attrs, radius=radius)
    img_capsule = render_tubes_image(scene, cam, tf=tf, settings=settings,
                                     supersample=ss)

    # The benchable flagship: the same triangle-8 geometry through the
    # analytic prism kernel (kernels/raster_prism.py).
    pscene = build_prism_scene(pos, mask, attrs, radius=radius)
    img_prism = render_tubes_prism_image(pscene, cam, tf=tf,
                                         settings=settings, supersample=ss)

    # Reference geometry: 8-subdivision triangle tubes (LineData.hpp:374).
    mesh = build_tube_triangle_mesh(
        jnp.asarray(pos), jnp.asarray(mask), jnp.asarray(attrs),
        radius=radius, num_subdivisions=8,
    )
    img_tri = render_opaque_image(mesh, cam, tf=tf, settings=settings,
                                  supersample=ss)
    return np.asarray(img_capsule), np.asarray(img_prism), np.asarray(img_tri)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from linevis_tpu.render.framebuffer import ssim

    scale = float(os.environ.get("LINEVIS_PARITY_SCALE", "1"))
    W = max(int(1920 * scale) // 32 * 32, 64)
    H = max(int(1080 * scale) // 32 * 32, 32)
    out = {
        "width": W, "height": H, "supersample": 2,
        # Per-geometry parity claims (VERDICT r4 #7):
        # - tubeGeometry='triangle' (the flagship parity geometry) IS the
        #   reference's raster default — the 8-subdivision triangle tube
        #   (Tubes.hpp:40, LineData.hpp:374-386) — so the geometry term of
        #   the SSIM-vs-reference budget is zero by construction; the
        #   remaining budget is the constant-pinned shading audit
        #   (docs/SSIM_GAP_ANALYSIS.md section 2).
        # - tubeGeometry='capsule' (the fast variant) substitutes the
        #   reference's RT geometry (VulkanRayTracer.hpp:53-63) into the
        #   raster path; its measured deviation FROM the triangle geometry
        #   is recorded per scene below.
        "flagship": {
            "tubeGeometry": "triangle",
            "geometry_delta_vs_reference": 0.0,
            "why": "identical 8-subdiv triangle tubes by construction",
        },
        # The BENCHABLE flagship: tubeGeometry='prism' renders the same
        # triangle-8 rings/frames/silhouette analytically
        # (kernels/raster_prism.py, planarized side quads); its measured
        # deviation from the exact triangle G-buffer is recorded per
        # scene and gated at the 0.99 north star.
        "prism_variant": {"scenes": {}},
        "capsule_variant": {"scenes": {}},
    }
    out["scenes"] = out["capsule_variant"]["scenes"]  # legacy alias
    print(f"geometry parity at {W}x{H} (2x SSAA): capsule + prism variants "
          f"vs the exact 8-subdiv triangle tubes")
    for name, (pos, mask, attrs, radius) in parity_scenes().items():
        cap, prism, tri = render_pair(pos, mask, attrs, radius, W, H)
        assert np.isfinite(cap).all() and np.isfinite(tri).all(), name
        assert np.isfinite(prism).all(), name
        s = float(ssim(cap[..., :3].mean(-1), tri[..., :3].mean(-1)))
        mad = float(np.abs(cap[..., :3] - tri[..., :3]).mean())
        out["scenes"][name] = {"ssim": round(s, 5), "mad": round(mad, 6)}
        sp = float(ssim(prism[..., :3].mean(-1), tri[..., :3].mean(-1)))
        madp = float(np.abs(prism[..., :3] - tri[..., :3]).mean())
        out["prism_variant"]["scenes"][name] = {
            "ssim": round(sp, 5), "mad": round(madp, 6),
        }
        print(f"  {name:12s} capsule SSIM {s:.5f} (|d| {mad:.6f})   "
              f"prism SSIM {sp:.5f} (|d| {madp:.6f})")
        try:
            from linevis_tpu.render.framebuffer import save_png

            os.makedirs("out", exist_ok=True)
            save_png(f"out/parity_{name}_capsule.png", cap)
            save_png(f"out/parity_{name}_prism.png", prism)
            save_png(f"out/parity_{name}_tri.png", tri)
        except Exception:
            pass

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "GEOMETRY_PARITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    worst = min(v["ssim"] for v in out["scenes"].values())
    print(f"worst-scene SSIM: {worst:.5f} (gate 0.99)")


if __name__ == "__main__":
    main()
