"""Property tests for the MBOIT power-moment reconstruction.

Mirrors the reference's approximation contract: the transmittance
reconstructed from 4/6/8 power moments (MomentMath.glsl:246-505) at a
*fragment depth* — the only place MBOIT pass 2 ever evaluates it
(MBOITPass2.glsl:21-37) — approximates
``prod_{d_j < z}(1-a_j) * (1-a_z)^overestimation``.  Mid-gap queries are
intentionally untested: with n fragments and only 2n moments the measure
is not unique and the canonical bound is legitimately loose there.
"""

import numpy as np
import jax.numpy as jnp

from linevis_tpu.kernels.moment_math import (
    _solve_quartic_neumark,
    atan2_poly,
    transmittance_at_depth_4,
    transmittance_at_depth_6,
    transmittance_at_depth_8,
)


def test_atan2_poly_matches_numpy():
    rng = np.random.default_rng(7)
    y = rng.uniform(-3, 3, size=(64,)).astype(np.float32)
    x = rng.uniform(-3, 3, size=(64,)).astype(np.float32)
    got = np.asarray(atan2_poly(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    assert np.max(np.abs(got - want)) < 5e-6


def test_quartic_neumark_matches_numpy_roots():
    rng = np.random.default_rng(3)
    for _ in range(20):
        roots = np.sort(rng.uniform(-1.2, 1.2, 4))
        # quartic with these real roots
        c = np.poly(roots)[::-1]  # c0..c4
        got = np.sort(np.array([
            float(v) for v in _solve_quartic_neumark(
                *[jnp.float32(x) for x in c]
            )
        ]))
        assert np.max(np.abs(got - roots)) < 5e-3, (got, roots)


def _moments(depths, alphas, n_mom):
    absorb = np.minimum(-np.log(np.maximum(1.0 - alphas, 1e-7)), 10.0)
    b0 = absorb.sum()
    odds = [np.sum(depths ** (2 * j + 1) * absorb) / b0
            for j in range(n_mom // 2)]
    evens = [np.sum(depths ** (2 * j + 2) * absorb) / b0
             for j in range(n_mom // 2)]
    return np.float32(b0), odds, evens


def _check_at_fragments(n_mom, fn, bias, tol, max_frag=None):
    rng = np.random.default_rng(42)
    beta = 0.1
    for _ in range(15):
        n_frag = rng.integers(1, (max_frag or n_mom // 2) + 1)
        depths = np.sort(rng.uniform(-0.8, 0.8, n_frag)).astype(np.float32)
        alphas = rng.uniform(0.2, 0.7, n_frag).astype(np.float32)
        # Avoid near-coincident fragments: the moment problem cannot
        # separate them (intrinsic resolution limit, not a solver bug).
        if n_frag > 1 and np.min(np.diff(depths)) < 0.15:
            continue
        b0, odds, evens = _moments(depths, alphas, n_mom)
        got = np.asarray(fn(
            jnp.float32(b0),
            tuple(jnp.float32(e) * jnp.ones(depths.shape) for e in evens),
            tuple(jnp.float32(o) * jnp.ones(depths.shape) for o in odds),
            jnp.asarray(depths), bias, beta,
        ))
        want = np.array([
            np.prod([1.0 - a for d, a in zip(depths, alphas) if d < z])
            * (1.0 - alphas[i]) ** beta
            for i, z in enumerate(depths)
        ])
        assert np.isfinite(got).all()
        assert np.max(np.abs(got - want)) < tol, (n_mom, got, want)


def test_transmittance_4_moments():
    _check_at_fragments(4, transmittance_at_depth_4, 5e-7, 0.02)


def test_transmittance_6_moments():
    _check_at_fragments(6, transmittance_at_depth_6, 5e-6, 0.03)


def test_transmittance_8_moments():
    _check_at_fragments(8, transmittance_at_depth_8, 5e-5, 0.08)


def test_transmittance_monotone_single_fragment():
    """One fragment: T=1 in front, ~1-alpha behind."""
    alpha = 0.5
    b0, odds, evens = _moments(np.array([0.0]), np.array([alpha]), 4)
    z = jnp.asarray(np.linspace(-0.9, 0.9, 33, dtype=np.float32))
    T = np.asarray(transmittance_at_depth_4(
        jnp.float32(b0),
        tuple(jnp.float32(e) * jnp.ones(z.shape) for e in evens),
        tuple(jnp.float32(o) * jnp.ones(z.shape) for o in odds),
        z, 5e-7, 0.1,
    ))
    assert abs(T[0] - 1.0) < 0.02
    assert abs(T[-1] - (1.0 - alpha)) < 0.02
    # Monotone non-increasing (within fp slack).
    assert np.all(np.diff(T) < 1e-3)


def test_unorm16_quantization_round_trip():
    """quantizeMoments / offsetAndDequantizeMoments matrix pairs invert
    each other, and valid normalized moments map into [0, 1]
    (MomentMath.glsl:156-243)."""
    from linevis_tpu.kernels.moment_math import (
        dequantize_moments_unorm16,
        quantize_moments_unorm16,
    )

    rng = np.random.default_rng(0)
    for n_mom in (4, 6, 8):
        h = n_mom // 2
        for _ in range(5):
            d = rng.uniform(-1, 1, 6)
            w = rng.uniform(0.1, 1, 6)
            w /= w.sum()
            odds = [jnp.float32((d ** (2 * j + 1) * w).sum())
                    for j in range(h)]
            evens = [jnp.float32((d ** (2 * j + 2) * w).sum())
                     for j in range(h)]
            oq, eq = quantize_moments_unorm16(odds, evens, n_mom)
            for x in (*oq, *eq):
                assert -0.05 <= float(x) <= 1.05, (n_mom, float(x))
            o2, e2 = dequantize_moments_unorm16(oq, eq, n_mom)
            err = max(abs(float(a) - float(b))
                      for a, b in zip((*o2, *e2), (*odds, *evens)))
            assert err < 1e-5, (n_mom, err)
