"""Multi-var rendering: per-attribute TFs via TF concatenation."""

import numpy as np
import jax.numpy as jnp

from linevis_tpu.render.multivar import (
    MultiVarTransferFunctions,
    build_multivar_tube_mesh,
    combine_transfer_function_table,
    combine_transfer_functions,
)
from linevis_tpu.render.transfer_function import TransferFunction, tf_eval_points


def _const_tf(r, g, b):
    # Constant-color TF (from_points takes 0-255 sRGB-ish channel values).
    return TransferFunction.from_points(
        [(0.0, 255 * r, 255 * g, 255 * b), (1.0, 255 * r, 255 * g, 255 * b)]
    )


def test_combined_tf_exact_per_sector():
    """Packed attribute (k + a)/K through the combined TF == TF_k(a)."""
    mv = MultiVarTransferFunctions([
        TransferFunction.standard(), _const_tf(0.0, 1.0, 0.0),
        _const_tf(0.0, 0.0, 1.0),
    ])
    c_pts, o_pts = combine_transfer_functions(mv)
    K = 3
    xs = np.linspace(0.05, 0.95, 7, dtype=np.float32)
    for k, tf in enumerate(mv.tfs):
        ck, ok = tf.as_static_points()
        want_rgb, want_a = tf_eval_points(ck, ok, jnp.asarray(xs))
        packed = jnp.asarray((k + xs) / K)
        got_rgb, got_a = tf_eval_points(c_pts, o_pts, packed)
        np.testing.assert_allclose(
            np.asarray(got_rgb), np.asarray(want_rgb), atol=2e-3,
        )
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                                   atol=2e-3)


def test_multivar_mesh_sectors():
    L, P, S, K = 2, 5, 8, 2
    rng = np.random.default_rng(0)
    pos = np.zeros((L, P, 3), np.float32)
    pos[:, :, 0] = np.linspace(-0.3, 0.3, P)
    pos[1, :, 1] = 0.2
    mask = np.ones((L, P), bool)
    a0 = rng.uniform(0, 1, (L, P)).astype(np.float32)
    a1 = rng.uniform(0, 1, (L, P)).astype(np.float32)
    mesh = build_multivar_tube_mesh(pos, mask, [a0, a1], radius=0.02,
                                    num_subdivisions=S)
    attrs = np.asarray(mesh.attrs)  # [S, L, P]
    # First half of the ring carries attribute 0 packed into [0, 0.5).
    assert (attrs[: S // 2] < 0.5).all()
    np.testing.assert_allclose(attrs[0] * K, a0, atol=1e-5)
    # Second half carries attribute 1 packed into [0.5, 1).
    assert (attrs[S // 2 :] >= 0.5).all()
    np.testing.assert_allclose(attrs[S // 2] * K - 1.0, a1, atol=2e-5)


def test_multivar_renders():
    import dataclasses

    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.opaque import render_opaque_image
    from linevis_tpu.render.pipeline import RasterSettings

    L, P = 3, 6
    rng = np.random.default_rng(1)
    pos = np.zeros((L, P, 3), np.float32)
    pos[:, :, 0] = np.linspace(-0.3, 0.3, P)
    for i in range(L):
        pos[i, :, 1] = -0.15 + 0.15 * i
    mask = np.ones((L, P), bool)
    a0 = np.zeros((L, P), np.float32)
    a1 = np.ones((L, P), np.float32) * 0.999
    # Alternate red/green sectors every quarter ring so both attribute
    # sectors are visible from any camera (a 2-sector split can put one
    # attribute entirely on the tube's far side).
    mv = MultiVarTransferFunctions(
        [_const_tf(1.0, 0.0, 0.0), _const_tf(0.0, 1.0, 0.0),
         _const_tf(1.0, 0.0, 0.0), _const_tf(0.0, 1.0, 0.0)]
    )
    combined_tf = combine_transfer_function_table(mv)
    mesh = build_multivar_tube_mesh(pos, mask, [a0, a1, a0, a1],
                                    radius=0.04, num_subdivisions=8)
    cam = Camera(position=(0.0, 0.0, 1.2), width=64, height=48)
    S = RasterSettings(width=64, height=48, tile_w=16, tile_h=8)
    img = render_opaque_image(mesh, cam, tf=combined_tf, settings=S)
    assert np.isfinite(img).all()
    fg = (img[..., :3] < 0.999).any(-1)
    red = fg & (img[..., 0] > img[..., 1] * 2)
    green = fg & (img[..., 1] > img[..., 0] * 2)
    # Both sectors visible: red (attr 0 / TF0) and green (attr 1 / TF1).
    assert red.sum() > 20 and green.sum() > 20, (red.sum(), green.sum())
