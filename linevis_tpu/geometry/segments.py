"""Flat line-segment lists (for ray tracing, opacity optimization, filters).

Reference analogue: the per-segment buffers of the opacity-optimization
renderer (`src/Renderers/OIT/OpacityOptimizationRenderer.hpp:155-172`) and
the AABB list used for the ray tracer's BLAS
(`src/LineData/LineData.hpp:186,191` getVulkanTubeAabbRenderData).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class LineSegments:
    """[S_total] flat segments over all lines (S_total = L*(P-1), padded).

    p0, p1:    [S, 3] endpoints
    attr0/1:   [S] endpoint attribute values
    line_id:   [S] int32
    seg_id_in_line: [S] int32
    mask:      [S] bool — both endpoints valid
    """

    p0: jnp.ndarray
    p1: jnp.ndarray
    attr0: jnp.ndarray
    attr1: jnp.ndarray
    line_id: jnp.ndarray
    seg_id_in_line: jnp.ndarray
    mask: jnp.ndarray

    @property
    def num_segments(self) -> int:
        return int(self.p0.shape[0])

    def aabbs(self, radius: float) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-capsule AABBs [(S,3),(S,3)] (segment swept by sphere radius)."""
        lo = jnp.minimum(self.p0, self.p1) - radius
        hi = jnp.maximum(self.p0, self.p1) + radius
        return lo, hi


def build_line_segments(positions, mask, attrs) -> LineSegments:
    """positions [L,P,3], mask [L,P], attrs [L,P] -> flat LineSegments."""
    positions = jnp.asarray(positions)
    mask = jnp.asarray(mask)
    attrs = jnp.asarray(attrs)
    L, P = positions.shape[0], positions.shape[1]
    p0 = positions[:, :-1].reshape(-1, 3)
    p1 = positions[:, 1:].reshape(-1, 3)
    a0 = attrs[:, :-1].reshape(-1)
    a1 = attrs[:, 1:].reshape(-1)
    seg_mask = (mask[:, :-1] & mask[:, 1:]).reshape(-1)
    line_id = jnp.broadcast_to(
        jnp.arange(L, dtype=jnp.int32)[:, None], (L, P - 1)
    ).reshape(-1)
    seg_id = jnp.broadcast_to(
        jnp.arange(P - 1, dtype=jnp.int32)[None, :], (L, P - 1)
    ).reshape(-1)
    return LineSegments(
        p0=p0, p1=p1, attr0=a0, attr1=a1,
        line_id=line_id, seg_id_in_line=seg_id, mask=seg_mask,
    )
