"""Bounded-K OIT fidelity study on reference-scale deep scenes.

The reference sizes its PPLL fragment buffer for "very large" scenes at
an EXPECTED depth complexity of avg ~120 / max ~380 fragments per pixel
(`/root/reference/src/Renderers/OIT/PerPixelLinkedListLineRenderer.hpp:
44-48`).  Our OIT redesign replaces the unbounded linked list with a
K-node in-VMEM buffer + MLAB overflow merge, so the open question is:
what image fidelity does K=8/16/32 achieve at that fragment depth?

This script builds a synthetic scene AT that depth (a dense block of
parallel semi-transparent tubes, plus a denser clump that pushes the max
pixel), renders the exact unbounded blend with the iterative re-cast ray
tracer (`render/ray_tracer.py`, the oracle — reference TubeRayTracing
.glsl:61-82 semantics), renders the MLAB raster at several K, and writes
the SSIM / mean-error table to `docs/BOUNDED_K_FIDELITY.md`.

`tests/test_bounded_k.py` pins the K=16 row as a regression gate.

Run (CPU interpret mode is fine, ~minutes):
    JAX_PLATFORMS=cpu python examples/bounded_k_fidelity.py
"""

from __future__ import annotations

import numpy as np

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; force via config (this study
# runs in interpret mode — the exact ray-tracer oracle needs no TPU).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def deep_scene(depth_layers: int = 52, rows: int = 18,
               clump_layers: int = 130, radius: float = 0.018,
               spacing: float = 0.028):
    """A [rows x depth_layers] block of x-parallel tubes (every camera ray
    that hits the block crosses ~depth_layers tubes = 2*depth_layers
    surfaces), plus a clump of `clump_layers` tightly stacked tubes in the
    middle that pushes the max-DC pixel toward the reference's 380."""
    from linevis_tpu.render.tube_raster import build_capsule_scene

    lines = []
    for iy in range(rows):
        for iz in range(depth_layers):
            y = (iy - rows / 2 + 0.5) * spacing
            z = (iz - depth_layers / 2 + 0.5) * spacing
            lines.append(((-0.45, y, z), (0.45, y, z)))
    # Dense clump: tubes nearly coaxial in depth at the block center.
    for j in range(clump_layers):
        z = (j - clump_layers / 2) * (radius * 0.55)
        lines.append(((-0.12, 0.001 * j, z * 0.35), (0.12, 0.001 * j, z * 0.35)))
    pos = np.asarray(lines, np.float32)  # [L, 2, 3]
    L = pos.shape[0]
    rng = np.random.default_rng(3)
    attr = rng.uniform(0.0, 1.0, (L, 1)).astype(np.float32)
    attr = np.repeat(attr, 2, axis=1)
    return build_capsule_scene(
        pos, np.ones((L, 2), bool), attr, radius=radius
    )


def study(width: int = 72, height: int = 56, opacity: float = 0.06,
          ks=(8, 16, 32), mdc: int = 420):
    import jax

    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.framebuffer import ssim
    from linevis_tpu.render.oit import (
        render_depth_complexity,
        render_tubes_mlab,
    )
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.ray_tracer import render_tubes_raytraced
    from linevis_tpu.render.tube_raster import _proj_constants

    scene = deep_scene()
    n_seg = int(np.asarray(scene.mask).sum())
    cam = Camera(position=(0.0, 0.15, 2.2), look_at_point=(0.0, 0.0, 0.0),
                 width=width, height=height)
    settings = RasterSettings(
        width=width, height=height, tile_w=16, tile_h=8, chunk=128,
        span_x=6, span_y=6,
    )
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))

    dc = np.asarray(render_depth_complexity(scene, vp, cp, ab, settings))
    hit = dc[dc > 0]
    dc_avg, dc_max = float(hit.mean()), float(dc.max())
    print(f"scene: {n_seg} segments; depth complexity avg {dc_avg:.0f} "
          f"/ max {dc_max:.0f} (reference 'very large': avg 120 / max 380)")
    assert mdc >= dc_max + 8, (mdc, dc_max)

    oracle = np.asarray(render_tubes_raytraced(
        scene, vp, cp, ab, settings,
        max_depth_complexity=mdc, opacity=opacity,
    ))
    oracle = jax.block_until_ready(oracle)
    print("oracle (exact re-cast ray tracer) done")

    rows = []
    for K in ks:
        img = np.asarray(render_tubes_mlab(
            scene, vp, cp, ab, settings, K=K, opacity=opacity
        ))
        s = min(
            ssim(oracle[c], img[c]) for c in range(3)
        )
        mad = float(np.abs(oracle[:3] - img[:3]).mean())
        p99 = float(np.quantile(np.abs(oracle[:3] - img[:3]), 0.99))
        rows.append((K, s, mad, p99))
        print(f"K={K:3d}: SSIM {s:.4f}  mean|err| {mad:.5f}  p99 {p99:.4f}")
    return dict(n_seg=n_seg, dc_avg=dc_avg, dc_max=dc_max,
                width=width, height=height, opacity=opacity, rows=rows)


def write_doc(res, path="docs/BOUNDED_K_FIDELITY.md"):
    lines = [
        "# Bounded-K OIT fidelity at reference depth complexity",
        "",
        "The reference PPLL sizes its fragment buffer for \"very large\"",
        "scenes at avg ~120 / max ~380 fragments per pixel",
        "(`PerPixelLinkedListLineRenderer.hpp:44-48`).  Our redesign bounds",
        "per-pixel state to K in-VMEM nodes with the MLAB overflow merge.",
        "This table quantifies that approximation against the EXACT",
        "unbounded front-to-back blend (the iterative re-cast ray tracer,",
        "`render/ray_tracer.py` = `TubeRayTracing.glsl:61-82` semantics) on",
        "a synthetic scene AT the reference depth:",
        "",
        f"- scene: {res['n_seg']} capsule segments, "
        f"{res['width']}x{res['height']}, per-surface opacity scale "
        f"{res['opacity']} (deep fragments matter: T saturates only after "
        "~100+ surfaces)",
        f"- measured depth complexity: **avg {res['dc_avg']:.0f} / max "
        f"{res['dc_max']:.0f}** surfaces/pixel",
        "",
        "| K | min-channel SSIM | mean abs err | p99 abs err |",
        "|---|---|---|---|",
    ]
    for K, s, mad, p99 in res["rows"]:
        lines.append(f"| {K} | {s:.4f} | {mad:.5f} | {p99:.4f} |")
    lines += [
        "",
        "Generated by `examples/bounded_k_fidelity.py`.  K=32 meets the",
        "0.99 SSIM bar at reference depth — the PPLL (exact) renderer mode",
        "defaults to K=32; K=8 remains the MLAB default (the reference's",
        "MLAB is the same approximation).  `tests/test_bounded_k.py` (slow",
        "tier) pins the gate on a reduced scene.",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")


if __name__ == "__main__":
    res = study()
    write_doc(res)
