"""EAW / SVGF denoiser tests: noise reduction + edge preservation."""

import numpy as np
import jax.numpy as jnp

from linevis_tpu.render.denoiser import eaw_denoise, svgf_denoise


def _noisy_edge(h=32, w=32, sigma=0.15, seed=0):
    """Two flat regions with a vertical edge + white noise."""
    rng = np.random.default_rng(seed)
    clean = np.zeros((3, h, w), np.float32)
    clean[:, :, w // 2:] = 0.8
    clean[:, :, : w // 2] = 0.2
    noisy = clean + rng.normal(0, sigma, clean.shape).astype(np.float32)
    # Position/normal feature maps follow the same edge.
    pos = np.zeros((3, h, w), np.float32)
    pos[0] = np.linspace(0, 1, w)[None, :]
    nrm = np.zeros((3, h, w), np.float32)
    nrm[2, :, : w // 2] = 1.0
    nrm[0, :, w // 2:] = 1.0
    return clean, noisy, pos, nrm


def _mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def test_eaw_reduces_noise_preserves_edge():
    clean, noisy, pos, nrm = _noisy_edge()
    out = np.asarray(eaw_denoise(
        jnp.asarray(noisy), jnp.asarray(pos), jnp.asarray(nrm),
        num_iterations=3,
    ))
    assert _mse(out, clean) < 0.25 * _mse(noisy, clean)
    # Edge preserved: the two halves stay distinct.
    left = out[:, :, : 12].mean()
    right = out[:, :, 20:].mean()
    assert right - left > 0.45, (left, right)


def test_svgf_reduces_noise_preserves_edge():
    clean, noisy, pos, nrm = _noisy_edge(seed=4)
    out = np.asarray(svgf_denoise(
        jnp.asarray(noisy), jnp.asarray(pos), jnp.asarray(nrm),
        num_iterations=3,
    ))
    assert _mse(out, clean) < 0.3 * _mse(noisy, clean)
    left = out[:, :, : 12].mean()
    right = out[:, :, 20:].mean()
    assert right - left > 0.45, (left, right)


def test_eaw_identity_on_constant():
    img = jnp.full((3, 16, 16), 0.5, jnp.float32)
    out = np.asarray(eaw_denoise(img, num_iterations=2))
    np.testing.assert_allclose(out, 0.5, atol=1e-5)


def test_spatial_hash_denoise_averages_within_cells():
    """Pixels sharing a world-space cell + quantized normal get the cell
    mean (SH_Denoise.glsl write/read passes); far-apart surfaces don't
    mix."""
    import jax.numpy as jnp
    from linevis_tpu.render.denoiser import spatial_hash_denoise

    H, W = 16, 32
    rng = np.random.default_rng(0)
    # Left half: one surface point; right half: a distant one.
    pos = np.zeros((3, H, W), np.float32)
    pos[:, :, W // 2:] = 5.0
    nrm = np.zeros((3, H, W), np.float32)
    nrm[2] = 1.0
    noisy = np.where(
        np.arange(W)[None, :] < W // 2,
        0.3 + rng.normal(0, 0.05, (H, W)),
        0.8 + rng.normal(0, 0.05, (H, W)),
    ).astype(np.float32)
    out = np.asarray(spatial_hash_denoise(
        jnp.asarray(noisy), jnp.asarray(pos), jnp.asarray(nrm),
        jnp.asarray([0.0, 0.0, 2.0], jnp.float32),
    ))
    left = noisy[:, :W // 2].mean()
    right = noisy[:, W // 2:].mean()
    np.testing.assert_allclose(out[:, :W // 2], left, atol=1e-5)
    np.testing.assert_allclose(out[:, W // 2:], right, atol=1e-5)
    assert abs(left - right) > 0.3  # cells did not merge


def test_spatial_hash_denoise_respects_normals():
    """Same cell, opposing normals -> separate hash entries (H7D mixes
    the quantized normal into the key)."""
    import jax.numpy as jnp
    from linevis_tpu.render.denoiser import spatial_hash_denoise

    H, W = 8, 8
    pos = np.zeros((3, H, W), np.float32)
    nrm = np.zeros((3, H, W), np.float32)
    nrm[2, :, : W // 2] = 1.0
    nrm[2, :, W // 2:] = -1.0
    vals = np.where(np.arange(W)[None, :] < W // 2, 0.2, 0.9).astype(
        np.float32
    )
    vals = np.broadcast_to(vals, (H, W)).copy()
    out = np.asarray(spatial_hash_denoise(
        jnp.asarray(vals), jnp.asarray(pos), jnp.asarray(nrm),
        jnp.asarray([0.0, 0.0, 2.0], jnp.float32),
    ))
    np.testing.assert_allclose(out[:, : W // 2], 0.2, atol=1e-5)
    np.testing.assert_allclose(out[:, W // 2:], 0.9, atol=1e-5)


def test_svgf_temporal_converges_under_moving_camera():
    """Full temporal SVGF (SVGF.hpp:46,92): under a panning camera with
    correct motion vectors, temporal integration converges to the clean
    signal faster than spatial-only filtering of any single frame; fresh
    disocclusions restart their history."""
    import jax.numpy as jnp

    from linevis_tpu.render.denoiser import (
        svgf_denoise,
        svgf_temporal_denoise,
    )

    H, W, N = 24, 32, 12
    rng = np.random.default_rng(7)
    world_w = W + N
    xs = np.linspace(0, 4 * np.pi, world_w)
    truth_row = (0.5 + 0.4 * np.sin(xs)).astype(np.float32)
    truth = np.broadcast_to(truth_row, (H, world_w))
    # World positions: x = column * 0.01 (pan does not change a point's
    # world position, only which pixel sees it).
    pos_x = (np.arange(world_w) * 0.01).astype(np.float32)

    state = None
    out = None
    last_frame = None
    for f in range(N):
        noise = rng.normal(0, 0.15, (H, W)).astype(np.float32)
        frame = np.broadcast_to(
            truth[:, f : f + W], (H, W)
        ) + noise
        color = jnp.asarray(np.broadcast_to(frame, (3, H, W)))
        pos = np.zeros((3, H, W), np.float32)
        pos[0] = pos_x[f : f + W]
        pos[1] = (np.arange(H) * 0.01)[:, None]
        # Camera pans right 1 px/frame: content shifts LEFT, so
        # motion = cur_px - prev_px = -1 in x.
        motion = np.zeros((2, H, W), np.float32)
        if f > 0:
            motion[0] = -1.0
        out, state = svgf_temporal_denoise(
            color, jnp.asarray(motion), jnp.asarray(pos), state,
        )
        last_frame = color

    # History accumulates along the pan (reprojection valid); the last
    # N-1 columns entered the frame during the pan and are younger.
    length = np.asarray(state.length)
    assert length[:, : W - N].min() >= N - 1
    # The newest column is a disocclusion: history restarted.
    assert length[:, -1].max() <= 1.5

    truth_last = np.broadcast_to(truth[:, N - 1 : N - 1 + W], (H, W))
    # The temporally INTEGRATED signal (pre-filter) converges ~1/len:
    # variance shrinks by far more than any spatial pass can manage
    # without bias.
    err_integrated = float(
        np.mean((np.asarray(state.color)[0] - truth_last) ** 2)
    )
    err_raw = float(np.mean((np.asarray(last_frame)[0] - truth_last) ** 2))
    assert err_integrated < 0.25 * err_raw, (err_integrated, err_raw)
    # And the full filtered output still beats spatial-only filtering of
    # the single frame (both share the a-trous blur bias on the sine).
    err_temporal = float(
        np.mean((np.asarray(out)[0] - truth_last) ** 2)
    )
    spatial_only = np.asarray(svgf_denoise(last_frame))[0]
    err_spatial = float(np.mean((spatial_only - truth_last) ** 2))
    assert err_temporal < err_spatial, (err_temporal, err_spatial)


def test_svgf_temporal_disocclusion_resets():
    """A geometry mismatch at reprojection invalidates the history."""
    import jax.numpy as jnp

    from linevis_tpu.render.denoiser import svgf_temporal_denoise

    H, W = 8, 8
    color = jnp.ones((3, H, W), jnp.float32)
    motion = jnp.zeros((2, H, W), jnp.float32)
    pos1 = jnp.zeros((3, H, W), jnp.float32)
    pos2 = jnp.ones((3, H, W), jnp.float32)  # surface jumped -> invalid
    _, state = svgf_temporal_denoise(color, motion, pos1, None)
    _, state2 = svgf_temporal_denoise(color, motion, pos1, state)
    assert float(np.asarray(state2.length).min()) == 2.0
    _, state3 = svgf_temporal_denoise(color, motion, pos2, state2)
    assert float(np.asarray(state3.length).max()) == 1.0
