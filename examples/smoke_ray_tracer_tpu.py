"""TPU smoke for the exact re-cast ray tracer + MLAT + env-map VPT.

Small frames — the wavefront while-loops are the parity path, not the
fast path; this validates Mosaic/XLA lowering + finiteness on device
(VERDICT r2 item 2: 'run it once on the real TPU').
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices())

    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.ray_tracer import (
        build_capsule_bvh,
        render_tubes_mlat,
        render_tubes_raytraced,
    )
    from linevis_tpu.render.tube_raster import (
        _proj_constants,
        build_capsule_scene,
    )

    rng = np.random.default_rng(12)
    L, P = 5, 8
    pos = np.cumsum(rng.normal(0, 0.07, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    scene = build_capsule_scene(
        pos, np.ones((L, P), bool),
        rng.uniform(0, 1, (L, P)).astype(np.float32), radius=0.03,
    )
    W, H = 128, 96
    cam = Camera(position=(0.0, 0.1, 1.2), look_at_point=(0, 0, 0),
                 width=W, height=H)
    settings = RasterSettings(width=W, height=H, tile_w=16, tile_h=8,
                              chunk=32, span_x=3, span_y=3)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    bvh = build_capsule_bvh(scene)

    t0 = time.time()
    rt = np.asarray(render_tubes_raytraced(
        scene, vp, cp, ab, settings, max_depth_complexity=16, opacity=0.4,
        bvh=bvh,
    ))
    print(f"recast: {time.time() - t0:.1f}s finite={np.isfinite(rt).all()} "
          f"mean={rt.mean():.4f} covered={(rt[3] > 0.01).mean():.3f}")
    assert np.isfinite(rt).all()
    assert (rt[3] > 0.01).mean() > 0.05

    t0 = time.time()
    ml = np.asarray(render_tubes_mlat(
        scene, vp, cp, ab, settings, K=8, opacity=0.4, bvh=bvh,
    ))
    print(f"mlat:   {time.time() - t0:.1f}s finite={np.isfinite(ml).all()} "
          f"mean={ml.mean():.4f}")
    assert np.isfinite(ml).all()
    diff = np.abs(rt - ml)
    print(f"recast-vs-mlat mean diff {diff.mean():.5f}")

    # Env-map VPT on device.
    from linevis_tpu.render.vpt import VptSettings, render_vpt

    env = np.zeros((16, 32, 3), np.float32)
    env[:8] = (0.3, 0.5, 1.0)
    env[8:] = (0.4, 0.3, 0.2)
    z, y, x = np.meshgrid(*(np.linspace(-1, 1, 16),) * 3, indexing="ij")
    grid = np.exp(-4 * (x * x + y * y + z * z)).astype(np.float32)
    t0 = time.time()
    img = np.asarray(render_vpt(
        jax.random.PRNGKey(0), jnp.asarray(grid),
        jnp.asarray([0.0, 0.0, -1.5]), jnp.eye(3), 64, 48,
        settings=VptSettings(max_events=64), spp=1,
        env_map=jnp.asarray(env), env_intensity=1.0,
    ))
    print(f"vpt+env: {time.time() - t0:.1f}s "
          f"finite={np.isfinite(img).all()} mean={img.mean():.4f}")
    assert np.isfinite(img).all()
    assert img.mean() > 0.01

    try:
        from PIL import Image

        Image.fromarray(
            (np.clip(np.moveaxis(rt[:3], 0, -1), 0, 1) * 255).astype(np.uint8)
        ).save("out/raytraced_smoke.png")
    except Exception:
        pass
    print("OK")


if __name__ == "__main__":
    main()
