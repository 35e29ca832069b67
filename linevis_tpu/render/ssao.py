"""Screen-space ambient occlusion (SSAO + horizon-based GTAO).

Port of `src/Renderers/AmbientOcclusion/{SSAO.cpp:396,GTAO.cpp:425}` +
`Data/Shaders/AO/SSAO/GenerateSSAOTexture.glsl`:

- SSAO: hemisphere kernel samples around each fragment's view-space
  position (radius 0.05, bias 0.005, lerp-scaled sample distances
  0.1..1.0 — SSAO.cpp:307-327, GenerateSSAOTexture.glsl:48-100) tested
  against the depth buffer with the reference's smoothstep range check.
- GTAO: per pixel, screen-space horizon march along a few directions,
  occlusion from the max horizon angle above the tangent plane.

Both operate on the raster G-buffer's view-space depth + normals; the
sample lookups are XLA gathers on [H, W] maps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ssao", "gtao"]


def _view_positions(view_z, ray_basis):
    """[3, H, W] view-ray-scaled positions (camera at origin)."""
    H, W = view_z.shape
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :] * (2.0 / W) - 1.0
    v = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None] * (2.0 / H)
    d = (
        ray_basis[:, 0][:, None, None] * jnp.broadcast_to(u, (H, W))[None]
        + ray_basis[:, 1][:, None, None] * jnp.broadcast_to(v, (H, W))[None]
        + ray_basis[:, 2][:, None, None]
    )
    return d * view_z[None]


@partial(jax.jit, static_argnames=("num_samples",))
def ssao(
    view_z: jnp.ndarray,  # [H, W] view depth (big value = background)
    normal: jnp.ndarray,  # [3, H, W] world/view normals (camera space ok)
    ray_basis: jnp.ndarray,  # [3, 3]
    fg: jnp.ndarray,  # [H, W] foreground mask
    radius: float = 0.05,
    bias: float = 0.005,
    num_samples: int = 16,
    seed: int = 0,
) -> jnp.ndarray:
    """-> AO [H, W] in [0, 1] (1 = unoccluded)."""
    H, W = view_z.shape
    pos = _view_positions(view_z, ray_basis)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    # Hemisphere kernel with lerp-scaled radii (SSAO.cpp:307-327).
    d = jax.random.normal(k1, (num_samples, 3))
    d = d.at[:, 2].set(jnp.abs(d[:, 2]))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    scale = 0.1 + (jnp.arange(num_samples) / num_samples) * 0.9
    kernel = d * scale[:, None]

    n = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=0, keepdims=True), 1e-12
    )
    # Per-pixel TBN (branchless Frisvad).
    sign = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[2])
    b = n[0] * n[1] * a
    t1 = jnp.stack([1.0 + sign * n[0] * n[0] * a, sign * b, -sign * n[0]], 0)
    t2 = jnp.stack([b, sign + n[1] * n[1] * a, -n[1]], 0)

    fwd = ray_basis[:, 2] / jnp.linalg.norm(ray_basis[:, 2])
    occ = jnp.zeros((H, W), jnp.float32)
    for i in range(num_samples):
        kx, ky, kz = kernel[i, 0], kernel[i, 1], kernel[i, 2]
        sample = pos + radius * (t1 * kx + t2 * ky + n * kz)
        # Project to pixel coordinates: depth along the forward axis.
        s_z = jnp.maximum(jnp.sum(sample * fwd[:, None, None], axis=0), 1e-4)
        r = ray_basis[:, 0]
        u_ax = ray_basis[:, 1]
        su = jnp.sum(sample * r[:, None, None], axis=0) / (
            jnp.sum(r * r) * s_z
        )
        sv = jnp.sum(sample * u_ax[:, None, None], axis=0) / (
            jnp.sum(u_ax * u_ax) * s_z
        )
        px = jnp.clip(((su + 1.0) * 0.5 * W).astype(jnp.int32), 0, W - 1)
        py = jnp.clip(((1.0 - sv) * 0.5 * H).astype(jnp.int32), 0, H - 1)
        scene_z = view_z[py, px]
        range_check = jnp.clip(radius / jnp.maximum(
            jnp.abs(view_z - scene_z), 1e-6
        ), 0.0, 1.0)
        range_check = range_check * range_check * (3.0 - 2.0 * range_check)
        occluded = jnp.where(scene_z <= s_z - bias, 1.0, 0.0)
        occ = occ + occluded * range_check
    ao = 1.0 - occ / num_samples
    return jnp.where(fg, ao, 1.0)


@partial(jax.jit, static_argnames=("num_directions", "num_steps"))
def gtao(
    view_z: jnp.ndarray,  # [H, W]
    normal: jnp.ndarray,  # [3, H, W]
    ray_basis: jnp.ndarray,
    fg: jnp.ndarray,
    radius: float = 0.05,
    num_directions: int = 4,
    num_steps: int = 6,
) -> jnp.ndarray:
    """Horizon-based AO (GTAO.cpp role): march screen-space directions,
    occlusion from the max elevation of nearer geometry within `radius`."""
    H, W = view_z.shape
    pos = _view_positions(view_z, ray_basis)
    fwd = ray_basis[:, 2] / jnp.linalg.norm(ray_basis[:, 2])
    n = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=0, keepdims=True), 1e-12
    )
    yy, xx = jnp.mgrid[0:H, 0:W]
    occ = jnp.zeros((H, W), jnp.float32)
    # Screen-space step length ~ radius projected at the pixel's depth.
    px_per_unit = 0.5 * W * jnp.linalg.norm(ray_basis[:, 0])
    step_px = jnp.maximum(radius * px_per_unit / jnp.maximum(view_z, 1e-3)
                          / num_steps, 1.0)
    for di in range(num_directions):
        ang = np.pi * di / num_directions
        dx, dy = np.cos(ang), np.sin(ang)
        for s_dir in (1.0, -1.0):
            max_sin = jnp.zeros((H, W), jnp.float32)
            for s in range(1, num_steps + 1):
                sx = jnp.clip(
                    (xx + s_dir * dx * s * step_px).astype(jnp.int32),
                    0, W - 1,
                )
                sy = jnp.clip(
                    (yy + s_dir * dy * s * step_px).astype(jnp.int32),
                    0, H - 1,
                )
                sp = pos[:, sy, sx]
                delta = sp - pos
                dist = jnp.maximum(jnp.linalg.norm(delta, axis=0), 1e-6)
                # Elevation of the sample above the surface tangent plane.
                sin_h = jnp.sum(delta * n, axis=0) / dist
                valid = (dist < radius) & fg[sy, sx]
                max_sin = jnp.maximum(
                    max_sin, jnp.where(valid, sin_h, 0.0)
                )
            occ = occ + jnp.clip(max_sin, 0.0, 1.0)
    ao = 1.0 - occ / (2.0 * num_directions)
    return jnp.where(fg, jnp.clip(ao, 0.0, 1.0), 1.0)
