"""Parallel-transport frames along polylines, as vmapped scans.

Behavioral reference: tube frame construction in
`src/Renderers/Tubes/Tubes.hpp:159-205` (`initGlobalCircleVertexPositions`,
`insertOrientedCirclePoints`): the reference carries a normal along the line
by projecting the previous normal onto the plane of the new tangent. The
TPU-native version uses the same Gram-Schmidt transport expressed as a
`lax.scan` per line, vmapped over all lines — one fused XLA op, no CPU loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["compute_tangents", "parallel_transport_frames"]

_EPS = 1e-8


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)


def compute_tangents(positions: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Central-difference tangents for [L, P, 3] padded polylines.

    Endpoints use one-sided differences; padded points reuse the last valid
    tangent (positions are padded by repetition so differences vanish there —
    we substitute the previous tangent to keep frames well-defined).
    """
    fwd = positions[:, 1:] - positions[:, :-1]  # [L, P-1, 3]
    zero = jnp.zeros_like(fwd[:, :1])
    d_fwd = jnp.concatenate([fwd, zero], axis=1)
    d_bwd = jnp.concatenate([zero, fwd], axis=1)
    t = d_fwd + d_bwd
    # Fall back to whichever one-sided difference is nonzero.
    n = jnp.linalg.norm(t, axis=-1, keepdims=True)
    t = jnp.where(n > _EPS, t, d_bwd)
    n = jnp.linalg.norm(t, axis=-1, keepdims=True)
    t = jnp.where(n > _EPS, t, d_fwd)
    n = jnp.linalg.norm(t, axis=-1, keepdims=True)
    t = jnp.where(n > _EPS, t, jnp.array([1.0, 0.0, 0.0]))
    return _normalize(t)


def _initial_normal(t0: jnp.ndarray) -> jnp.ndarray:
    """Pick a stable vector orthogonal to t0 (reference picks the axis most
    orthogonal to the first tangent)."""
    ax = jnp.abs(t0)
    helper = jnp.where(
        (ax[0] <= ax[1]) & (ax[0] <= ax[2]),
        jnp.array([1.0, 0.0, 0.0]),
        jnp.where(
            ax[1] <= ax[2], jnp.array([0.0, 1.0, 0.0]), jnp.array([0.0, 0.0, 1.0])
        ),
    )
    n = helper - jnp.dot(helper, t0) * t0
    return _normalize(n)


def parallel_transport_frames(
    positions: jnp.ndarray, mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (tangents, normals, binormals), each [L, P, 3].

    Normals are parallel-transported: n_i = normalize(n_{i-1} - (n_{i-1}.t_i) t_i).
    """
    tangents = compute_tangents(positions, mask)

    def transport_line(t_line):
        n0 = _initial_normal(t_line[0])

        def step(n_prev, t_i):
            n = n_prev - jnp.dot(n_prev, t_i) * t_i
            norm = jnp.linalg.norm(n)
            # Degenerate (tangent parallel to normal): re-seed.
            n = jnp.where(norm > 1e-5, n / jnp.maximum(norm, _EPS), _initial_normal(t_i))
            return n, n

        _, normals = jax.lax.scan(step, n0, t_line)
        return normals

    normals = jax.vmap(transport_line)(tangents)
    binormals = _normalize(jnp.cross(tangents, normals))
    return tangents, normals, binormals
