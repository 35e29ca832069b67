"""Geometry tests: frames orthonormality/transport, tube meshing properties."""

import jax.numpy as jnp
import numpy as np

from linevis_tpu.geometry.frames import compute_tangents, parallel_transport_frames
from linevis_tpu.geometry.segments import build_line_segments
from linevis_tpu.geometry.tubes import build_tube_triangle_mesh


def _helix(n=64):
    t = np.linspace(0, 4 * np.pi, n).astype(np.float32)
    return np.stack([np.cos(t), np.sin(t), 0.1 * t], axis=-1)


def test_tangents_straight_line():
    pos = np.zeros((1, 8, 3), np.float32)
    pos[0, :, 0] = np.arange(8)
    mask = np.ones((1, 8), bool)
    t = np.asarray(compute_tangents(jnp.asarray(pos), jnp.asarray(mask)))
    np.testing.assert_allclose(t, np.broadcast_to([1.0, 0, 0], t.shape), atol=1e-6)


def test_frames_orthonormal():
    pos = _helix()[None]
    mask = np.ones(pos.shape[:2], bool)
    t, n, b = parallel_transport_frames(jnp.asarray(pos), jnp.asarray(mask))
    t, n, b = np.asarray(t), np.asarray(n), np.asarray(b)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(t * n, axis=-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(t * b, axis=-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(n * b, axis=-1), 0.0, atol=1e-5)


def test_frames_smooth_transport():
    """Consecutive normals should rotate slowly (no flips) on a smooth curve."""
    pos = _helix()[None]
    mask = np.ones(pos.shape[:2], bool)
    _, n, _ = parallel_transport_frames(jnp.asarray(pos), jnp.asarray(mask))
    n = np.asarray(n)[0]
    dots = np.sum(n[:-1] * n[1:], axis=-1)
    assert dots.min() > 0.95


def test_tube_mesh_shapes_and_radius():
    pos = _helix(32)[None]
    L, P = 1, 32
    S = 8
    mask = np.ones((L, P), bool)
    attrs = np.linspace(0, 1, P, dtype=np.float32)[None]
    mesh = build_tube_triangle_mesh(pos, mask, attrs, radius=0.05, num_subdivisions=S)
    assert mesh.vertices.shape == (3, L * P * S)
    assert mesh.triangles.shape == (3, L * (P - 1) * S * 2)
    # Every ring vertex is exactly `radius` away from its centerline point.
    # Flat index convention: v(l, p, s) = s*L*P + l*P + p.
    verts = np.asarray(mesh.vertices).reshape(3, S, L, P)
    d = np.linalg.norm(verts - pos.transpose(2, 0, 1)[:, None], axis=0)
    np.testing.assert_allclose(d, 0.05, atol=1e-5)
    # Normals are unit and point away from the axis.
    vn = np.asarray(mesh.vertex_normals)
    np.testing.assert_allclose(np.linalg.norm(vn, axis=0), 1.0, atol=1e-5)
    # Triangle indices in range, masks all true for full line.
    assert np.asarray(mesh.triangles).max() < mesh.num_vertices
    assert np.asarray(mesh.triangle_mask).all()


def test_tube_mesh_masking():
    pos = np.zeros((1, 8, 3), np.float32)
    pos[0, :, 0] = np.arange(8)
    mask = np.ones((1, 8), bool)
    mask[0, 5:] = False  # only 5 valid points -> 4 valid segments
    attrs = np.zeros((1, 8), np.float32)
    mesh = build_tube_triangle_mesh(pos, mask, attrs, num_subdivisions=4)
    # triangle order is (s, a, l, p): valid iff segment p < 4
    tri_mask = np.asarray(mesh.triangle_mask).reshape(4, 2, 1, 7)
    assert tri_mask[:, :, :, :4].all()
    assert not tri_mask[:, :, :, 4:].any()


def test_line_segments():
    pos = np.zeros((2, 4, 3), np.float32)
    pos[0, :, 0] = np.arange(4)
    pos[1, :, 1] = np.arange(4)
    mask = np.ones((2, 4), bool)
    mask[1, 3] = False
    attrs = np.arange(8, dtype=np.float32).reshape(2, 4)
    segs = build_line_segments(pos, mask, attrs)
    assert segs.num_segments == 6
    m = np.asarray(segs.mask)
    assert m.tolist() == [True, True, True, True, True, False]
    lo, hi = segs.aabbs(0.1)
    np.testing.assert_allclose(np.asarray(lo)[0], [-0.1, -0.1, -0.1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hi)[0], [1.1, 0.1, 0.1], atol=1e-6)
