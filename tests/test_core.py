"""Core data model tests: padding, AABB, normalization, transforms."""

import numpy as np
import pytest

from linevis_tpu.core.trajectories import (
    RaggedTrajectories,
    compute_trajectories_aabb,
    normalize_attributes,
    normalize_trajectories,
    pad_trajectories,
)
from linevis_tpu.core.transforms import (
    apply_transform,
    parse_transform_string,
    rotation_matrix,
)


def _ragged(rng, num_lines=5, num_attrs=2):
    positions, attributes = [], []
    for _ in range(num_lines):
        n = int(rng.integers(2, 40))
        positions.append(rng.normal(size=(n, 3)).astype(np.float32))
        attributes.append(rng.normal(size=(num_attrs, n)).astype(np.float32))
    return RaggedTrajectories(positions, attributes, ["a", "b"])


def test_pad_roundtrip(rng):
    ragged = _ragged(rng)
    traj = pad_trajectories(ragged)
    assert traj.num_lines == 5
    assert traj.max_points % 8 == 0
    for i in range(5):
        n = ragged.positions[i].shape[0]
        assert traj.num_points[i] == n
        np.testing.assert_allclose(traj.positions[i, :n], ragged.positions[i])
        np.testing.assert_allclose(traj.attributes[i, :, :n], ragged.attributes[i])
        assert traj.mask[i, :n].all()
        assert not traj.mask[i, n:].any()
        # Padding repeats last point
        np.testing.assert_allclose(
            traj.positions[i, n:], np.broadcast_to(
                ragged.positions[i][-1], (traj.max_points - n, 3))
        )


def test_aabb_and_normalize(rng):
    traj = pad_trajectories(_ragged(rng))
    aabb = compute_trajectories_aabb(traj)
    m = traj.mask[..., None]
    pts = traj.positions[np.broadcast_to(m, traj.positions.shape)].reshape(-1, 3)
    np.testing.assert_allclose(aabb[0], pts.min(0), rtol=1e-6)
    np.testing.assert_allclose(aabb[1], pts.max(0), rtol=1e-6)

    norm = normalize_trajectories(traj)
    aabb2 = compute_trajectories_aabb(norm)
    extent = aabb2[1] - aabb2[0]
    assert np.max(extent) == pytest.approx(1.0, abs=1e-5)
    center = 0.5 * (aabb2[0] + aabb2[1])
    np.testing.assert_allclose(center, 0.0, atol=1e-5)


def test_normalize_attributes(rng):
    traj = pad_trajectories(_ragged(rng))
    norm = normalize_attributes(traj)
    vals = norm.attributes[np.broadcast_to(traj.mask[:, None, :], norm.attributes.shape)]
    assert vals.min() == pytest.approx(0.0, abs=1e-6)
    assert vals.max() == pytest.approx(1.0, abs=1e-6)


def test_transform_string_rotate():
    m = parse_transform_string("rotate(270°, 1, 0, 0)")
    p = np.array([[0.0, 1.0, 0.0]], np.float32)
    # 270° about +x: y -> +z? rotate(270,x): (0,1,0) -> (0, cos270*1, sin270*1) = (0, 0, -1)
    out = apply_transform(m, p)
    np.testing.assert_allclose(out, [[0.0, 0.0, -1.0]], atol=1e-6)


def test_transform_chain():
    m = parse_transform_string("translate(1, 2, 3) scale(2)")
    out = apply_transform(m, np.array([[1.0, 1.0, 1.0]], np.float32))
    np.testing.assert_allclose(out, [[3.0, 4.0, 5.0]], atol=1e-6)


def test_rotation_matrix_orthonormal():
    m = rotation_matrix(0.7, [1, 2, 3])[:3, :3]
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-6)
