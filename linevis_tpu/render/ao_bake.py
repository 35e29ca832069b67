"""Ambient-occlusion prebaker: per-vertex AO along the tube parametrization.

Port of the reference RTAO prebaker
(`src/Renderers/AmbientOcclusion/VulkanAmbientOcclusionBaker.hpp:61,135-166`
+ `Data/Shaders/AO/RTAO/VulkanAmbientOcclusionBaker.glsl`): for every line
vertex and every one of `num_tube_subdivisions` ring positions, shoot
`samples_per_frame` cosine-weighted hemisphere rays from the tube surface
and count occlusions within `ao_radius`; accumulate over `num_frames`
iterations (the reference's iterative baking mode,
`AmbientOcclusionBaker.hpp:63-69`).  Reference defaults: 4 samples/frame,
8 subdivisions, radius 0.1.

Rays are traced against the same uniform `SegmentGrid` as screen-space
RTAO (`kernels/ao_grid.py`) — one wavefront of L*P*subdiv*samples rays
per frame, pair-sorted on device; no BVH, no ray-pipeline divergence.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.geometry.frames import (
    compute_tangents,
    parallel_transport_frames,
)
from linevis_tpu.kernels.ao_grid import (
    auto_grid_span,
    build_segment_grid,
    trace_ao_occlusion,
)
from linevis_tpu.render.rtao import _cosine_hemisphere

__all__ = ["AoBakeSettings", "bake_ambient_occlusion", "segment_average_ao"]


@dataclasses.dataclass(frozen=True)
class AoBakeSettings:
    """VulkanAmbientOcclusionBaker.hpp:163-166 defaults."""

    num_tube_subdivisions: int = 8
    samples_per_frame: int = 4
    num_frames: int = 8
    ao_radius: float = 0.1
    grid_resolution: int = 64
    max_ray_cells: int = 8
    seed: int = 0


@partial(jax.jit, static_argnames=("radius", "bake"))
def _bake_frame(
    key,
    positions: jnp.ndarray,  # [L, P, 3]
    mask: jnp.ndarray,  # [L, P]
    normals: jnp.ndarray,  # [L, P, 3] frame normal
    binormals: jnp.ndarray,  # [L, P, 3]
    grid,
    radius: float,
    bake: AoBakeSettings,
):
    L, P = positions.shape[:2]
    sub = bake.num_tube_subdivisions
    theta = (jnp.arange(sub, dtype=jnp.float32) + 0.5) * (2.0 * jnp.pi / sub)
    ring = (
        jnp.cos(theta)[:, None, None, None] * normals[None]
        + jnp.sin(theta)[:, None, None, None] * binormals[None]
    )  # [sub, L, P, 3] unit radial directions
    surf = positions[None] + ring * radius  # [sub, L, P, 3]

    n_pts = sub * L * P
    # channels-first [3, N] for the tracer
    o = surf.reshape(n_pts, 3).T
    n = ring.reshape(n_pts, 3).T
    # offset to avoid self-intersection with the own tube surface
    o = o + n * (radius * 0.01)
    occ_acc = jnp.zeros((n_pts,), jnp.float32)
    valid = jnp.broadcast_to(mask[None], (sub, L, P)).reshape(-1)
    dirs = _cosine_hemisphere(
        key, n.reshape(3, n_pts, 1), bake.samples_per_frame
    )[..., 0]  # [S, 3, N]
    for s in range(bake.samples_per_frame):
        occ = trace_ao_occlusion(
            o, dirs[s], jnp.full((n_pts,), bake.ao_radius), valid, grid,
            max_ray_cells=bake.max_ray_cells,
            interpret=jax.default_backend() == "cpu",
        )
        occ_acc = occ_acc + occ
    return occ_acc.reshape(sub, L, P)


def bake_ambient_occlusion(
    positions: np.ndarray,  # [L, P, 3]
    mask: np.ndarray,  # [L, P]
    radius: float,
    bake: AoBakeSettings = AoBakeSettings(),
) -> np.ndarray:
    """-> AO [L, P, num_tube_subdivisions] in [0, 1] (1 = unoccluded)."""
    pos = jnp.asarray(positions, jnp.float32)
    m = jnp.asarray(mask)
    tangents = compute_tangents(pos, m)
    normals, binormals, _ = parallel_transport_frames(pos, m)

    # Occluder scene: all tube segments.
    cf = pos.reshape(-1, 3).T.reshape(3, pos.shape[0], pos.shape[1])
    a = cf[:, :, :-1].reshape(3, -1)
    b = cf[:, :, 1:].reshape(3, -1)
    seg_mask = (m[:, :-1] & m[:, 1:]).reshape(-1)
    # Baked lines can have long straight segments; size the cell window so
    # the grid registers their full extent (clamping the resolution keeps
    # the pair expansion bounded).
    res = bake.grid_resolution
    span = auto_grid_span(a, b - a, radius, res)
    while span > 6 and res > 8:
        res //= 2
        span = auto_grid_span(a, b - a, radius, res)
    grid = build_segment_grid(
        a, b - a, radius, seg_mask, resolution=res, span=span
    )

    key = jax.random.PRNGKey(bake.seed)
    total = jnp.zeros(
        (bake.num_tube_subdivisions,) + pos.shape[:2], jnp.float32
    )
    for f in range(bake.num_frames):
        key, sub = jax.random.split(key)
        total = total + _bake_frame(
            sub, pos, m, normals, binormals, grid, float(radius), bake
        )
    n_rays = bake.num_frames * bake.samples_per_frame
    ao = 1.0 - total / n_rays
    return np.moveaxis(np.asarray(ao), 0, -1)  # [L, P, sub]


def segment_average_ao(ao: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Ring-averaged per-segment AO (a0, da) rows for the capsule shader:
    [2, S] with ao(u) = a0 + da * u along each segment."""
    ring_avg = ao.mean(axis=-1)  # [L, P]
    a0 = ring_avg[:, :-1].reshape(-1)
    a1 = ring_avg[:, 1:].reshape(-1)
    return np.stack([a0, a1 - a0], axis=0).astype(np.float32)
