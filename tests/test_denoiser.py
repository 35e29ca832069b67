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
