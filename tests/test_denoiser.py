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
