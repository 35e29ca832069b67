"""Voxel Ray Casting: curve discretization + quantized rendering."""

import numpy as np
import jax.numpy as jnp

from linevis_tpu.render.vrc import discretize_curves


def test_discretize_straight_line_preserves_geometry():
    """A straight diagonal line: clipped pieces must tile the segment
    (total length preserved up to quantization) and endpoints stay within
    half a quantization step of the original line."""
    n = 6
    pos = np.zeros((1, n, 3), np.float32)
    t = np.linspace(0.0, 1.0, n)
    pos[0, :, 0] = -0.4 + 0.8 * t
    pos[0, :, 1] = -0.3 + 0.6 * t
    pos[0, :, 2] = 0.1 * t
    mask = np.ones((1, n), bool)
    attrs = np.linspace(0, 1, n, dtype=np.float32)[None]

    G, Q = 16, 8
    q0, q1, a0, a1, valid = discretize_curves(
        jnp.asarray(pos), jnp.asarray(mask), jnp.asarray(attrs[0][None]),
        grid_resolution=G, quantization=Q, span=4,
    )
    q0, q1, valid = np.asarray(q0), np.asarray(q1), np.asarray(valid)
    a0, a1 = np.asarray(a0), np.asarray(a1)
    pieces = valid.sum()
    assert pieces >= n - 1  # at least one piece per input segment

    total_len = np.linalg.norm((q1 - q0)[:, valid], axis=0).sum()
    true_len = np.linalg.norm(pos[0, -1] - pos[0, 0])
    assert abs(total_len - true_len) / true_len < 0.15, (total_len, true_len)

    # All endpoints near the original line (within the quantization step).
    d = (pos[0, -1] - pos[0, 0]) / true_len
    cell = 0.8 / G  # largest extent axis ~0.8
    for q in (q0[:, valid], q1[:, valid]):
        rel = q.T - pos[0, 0]
        along = rel @ d
        perp = rel - np.outer(along, d)
        assert np.linalg.norm(perp, axis=1).max() < cell / Q * 2.5

    # Attributes monotone along the line.
    assert (a1[valid] >= a0[valid] - 1e-5).all()


def test_vrc_renderer_close_to_opaque():
    """Quantized VRC image approximates the exact capsule raster."""
    from linevis_tpu.core.trajectories import Trajectories
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.renderer import create_renderer
    from linevis_tpu.scene.line_data import LineData

    rng = np.random.default_rng(2)
    L, P = 6, 8
    pos = np.cumsum(rng.normal(0, 0.06, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    mask = np.ones((L, P), bool)
    attrs = rng.uniform(0, 1, (L, 1, P)).astype(np.float32)
    traj = Trajectories(
        positions=pos, attributes=attrs, mask=mask,
        num_points=np.full((L,), P, np.int32),
        attribute_names=["a"],
    )
    ld = LineData(traj)
    ld.set_line_width(0.04)

    cam = Camera(position=(0.0, 0.1, 1.2), width=48, height=32)

    opaque = create_renderer("Opaque")
    opaque.set_line_data(ld)
    img_o = opaque.render(cam)

    vrc = create_renderer("Voxel Ray Casting")
    vrc.set_line_data(ld)
    img_v = vrc.render(cam)

    assert img_v.shape == img_o.shape
    assert np.isfinite(img_v).all()
    cov_o = (img_o[..., :3] < 0.999).any(-1)
    cov_v = (img_v[..., :3] < 0.999).any(-1)
    # Coverage agrees except at quantization boundaries.
    agree = (cov_o == cov_v).mean()
    assert agree > 0.93, agree
    both = cov_o & cov_v
    diff = np.abs(img_o[..., :3] - img_v[..., :3])[both]
    assert diff.mean() < 0.15, diff.mean()
