"""Band / ribbon / hyperstreamline meshing (oriented elliptic tubes).

Behavioral reference: `createTriangleEllipticTubesRenderDataCPU`
(`src/Renderers/Tubes/TriangleTubesCPU.cpp:124-216`) and
`createTrianglePrincipalStressTubesRenderDataCPU` (`:220-330`), driven by
`LineDataStress` band render modes RIBBONS / EIGENVALUE_RATIO /
HYPERSTREAMLINES (`src/LineData/LineDataStress.hpp:224-229`,
`LineDataStress.cpp:2654-2692`) and flow ribbons
(`src/LineData/LineDataFlow.hpp:158-161`).

Frame convention (reference TriangleTubesCPU.cpp:252-268): tangent by
central differences, normal = cross(right_vector, tangent), binormal =
cross(tangent, normal); the ellipse's "normal" axis is the thin axis
(radius = band_width/2 * min_band_thickness for ribbons) and the
"binormal" axis the wide axis along the band right vector.

All lines mesh at once from padded [L, P] arrays, grid-shaped like
`geometry/tubes.py` ([3, S, L, P], long axes minor, zero gathers).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.geometry.tubes import TubeMesh, _tube_topology, tube_ring_directions

__all__ = [
    "build_band_tube_mesh",
    "build_principal_stress_tube_mesh",
    "central_difference_tangents",
]

# Reference defaults (LineData.cpp:53-54, LineDataStress hyperstreamlines).
MIN_BAND_THICKNESS = 0.15
MIN_HYPERSTREAMLINE_WIDTH = 0.02


def central_difference_tangents(positions: jnp.ndarray, mask: jnp.ndarray):
    """[L, P, 3], [L, P] -> [L, P, 3] unit tangents (fwd/central/bwd)."""
    p = positions
    fwd = jnp.roll(p, -1, axis=1) - p  # p[i+1] - p[i]
    bwd = p - jnp.roll(p, 1, axis=1)
    m_next = jnp.roll(mask, -1, axis=1).at[:, -1].set(False)
    m_prev = jnp.roll(mask, 1, axis=1).at[:, 0].set(False)
    central = jnp.where(
        (m_next & m_prev)[..., None], fwd + bwd,
        jnp.where(m_next[..., None], fwd, bwd),
    )
    n = jnp.maximum(jnp.linalg.norm(central, axis=-1, keepdims=True), 1e-8)
    return central / n


def _oriented_ellipse_grids(
    positions: jnp.ndarray,  # [L, P, 3]
    mask: jnp.ndarray,  # [L, P]
    attrs: jnp.ndarray,  # [L, P]
    right: jnp.ndarray,  # [L, P, 3] band right vectors
    r_normal: jnp.ndarray,  # [L, P] thin-axis radius per point
    r_binormal: jnp.ndarray,  # [L, P] wide-axis radius per point
    num_subdivisions: int,
):
    L, P = positions.shape[0], positions.shape[1]
    S = num_subdivisions
    LP = L * P
    tangent = central_difference_tangents(positions, mask)
    normal = jnp.cross(right, tangent)
    nn = jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)
    normal = normal / nn
    binormal = jnp.cross(tangent, normal)

    def cf(x):  # [L, P, 3] -> [3, 1, L, P]
        return x.reshape(LP, 3).T.reshape(3, 1, L, P)

    pos_c, n_c, b_c, t_c = cf(positions), cf(normal), cf(binormal), cf(tangent)
    rn = r_normal.reshape(1, 1, L, P)
    rb = r_binormal.reshape(1, 1, L, P)

    ring = jnp.asarray(tube_ring_directions(S))  # [S, 2]
    cosr = ring[:, 0].reshape(1, S, 1, 1)
    sinr = ring[:, 1].reshape(1, S, 1, 1)
    verts = pos_c + (cosr * rn) * n_c + (sinr * rb) * b_c
    # Ellipse surface normal: gradient direction (rb*cos along normal axis,
    # rn*sin along binormal axis) — TriangleTubesCPU.cpp:311-313.
    nrm = (cosr * rb) * n_c + (sinr * rn) * b_c
    vnorm = nrm / jnp.maximum(
        jnp.sqrt(jnp.sum(nrm * nrm, axis=0, keepdims=True)), 1e-8
    )
    vtang = jnp.broadcast_to(t_c, (3, S, L, P))
    vattr = jnp.broadcast_to(attrs[None], (S, L, P))
    return verts, vnorm, vtang, vattr


@partial(jax.jit, static_argnames=("num_subdivisions",))
def _band_mesh_jit(positions, mask, attrs, right, r_normal, r_binormal,
                   num_subdivisions):
    return _oriented_ellipse_grids(
        positions, mask, attrs, right, r_normal, r_binormal,
        num_subdivisions,
    )


def _finish_mesh(verts, vnorm, vtang, vattr, mask, L, P, S) -> TubeMesh:
    tris = jnp.asarray(_tube_topology(L, P, S))
    m = np.asarray(mask)
    seg_valid = jnp.asarray(m[:, :-1] & m[:, 1:])
    tri_mask = jnp.broadcast_to(
        seg_valid[None, None], (S, 2, L, P - 1)
    ).reshape(-1)
    return TubeMesh(
        positions=verts, normals=vnorm, tangents=vtang, attrs=vattr,
        mask=jnp.asarray(mask), triangles=tris, triangle_mask=tri_mask,
        num_subdivisions=S,
    )


def build_band_tube_mesh(
    positions: jnp.ndarray,  # [L, P, 3]
    mask: jnp.ndarray,  # [L, P]
    attrs: jnp.ndarray,  # [L, P]
    right_vectors: jnp.ndarray,  # [L, P, 3]
    band_width: float = 0.005,
    min_band_thickness: float = MIN_BAND_THICKNESS,
    num_subdivisions: int = 8,
) -> TubeMesh:
    """RIBBONS band mode / flow ribbons: constant elliptic cross-section,
    wide axis = band_width/2 along the right vector, thin axis scaled by
    min_band_thickness (LineDataStress.cpp:2656-2670)."""
    L, P = int(positions.shape[0]), int(positions.shape[1])
    S = int(num_subdivisions)
    rb = jnp.full((L, P), band_width * 0.5, jnp.float32)
    rn = rb * float(min_band_thickness)
    verts, vnorm, vtang, vattr = _band_mesh_jit(
        jnp.asarray(positions), jnp.asarray(mask),
        jnp.asarray(attrs, jnp.float32), jnp.asarray(right_vectors),
        rn, rb, S,
    )
    return _finish_mesh(verts, vnorm, vtang, vattr, mask, L, P, S)


def build_principal_stress_tube_mesh(
    positions: jnp.ndarray,  # [L, P, 3]
    mask: jnp.ndarray,  # [L, P]
    attrs: jnp.ndarray,  # [L, P]
    right_vectors: jnp.ndarray,  # [L, P, 3]
    ps_index_per_line: np.ndarray,  # [L] 0=major, 1=medium, 2=minor
    major: jnp.ndarray,  # [L, P] principal stresses
    medium: jnp.ndarray,
    minor: jnp.ndarray,
    band_width: float = 0.005,
    hyperstreamline: bool = False,
    min_hyperstreamline_width: float = MIN_HYPERSTREAMLINE_WIDTH,
    num_subdivisions: int = 8,
) -> TubeMesh:
    """EIGENVALUE_RATIO / HYPERSTREAMLINES band modes: per-point elliptic
    radii from the two non-propagating principal stresses
    (TriangleTubesCPU.cpp:270-301)."""
    L, P = int(positions.shape[0]), int(positions.shape[1])
    S = int(num_subdivisions)
    psi = jnp.asarray(ps_index_per_line)[:, None]  # [L, 1]
    major = jnp.asarray(major, jnp.float32)
    medium = jnp.asarray(medium, jnp.float32)
    minor = jnp.asarray(minor, jnp.float32)
    stress_x = jnp.where(psi == 0, medium, jnp.where(psi == 1, minor, medium))
    stress_z = jnp.where(psi == 0, minor, jnp.where(psi == 1, major, major))
    radius = band_width * 0.5
    if hyperstreamline:
        sx = jnp.maximum(jnp.abs(stress_x), min_hyperstreamline_width)
        sz = jnp.maximum(jnp.abs(stress_z), min_hyperstreamline_width)
        rn = radius * sx
        rb = radius * sz
    else:
        safe_x = jnp.where(jnp.abs(stress_x) < 1e-12, 1e-12, stress_x)
        safe_z = jnp.where(jnp.abs(stress_z) < 1e-12, 1e-12, stress_z)
        rn = radius * jnp.clip(jnp.abs(stress_x / safe_z), 0.0, 1.0)
        rb = radius * jnp.clip(jnp.abs(stress_z / safe_x), 0.0, 1.0)
    verts, vnorm, vtang, vattr = _band_mesh_jit(
        jnp.asarray(positions), jnp.asarray(mask),
        jnp.asarray(attrs, jnp.float32), jnp.asarray(right_vectors),
        rn, rb, S,
    )
    return _finish_mesh(verts, vnorm, vtang, vattr, mask, L, P, S)
