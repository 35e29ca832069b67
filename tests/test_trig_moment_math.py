"""Property tests for the MBOIT trigonometric-moment reconstruction.

Same contract as test_moment_math.py, for the reference's
`usePowerMoments = false` mode (`TrigonometricMomentMath.glsl`):
transmittance reconstructed from 2/3/4 complex (trigonometric) moments
at a fragment depth approximates
``prod_{d_j < z}(1-a_j) * (1-a_z)^overestimation``.  Additionally the
complex solvers are pinned against numpy (complex128) directly — the
trig path has an exact oracle because numpy has complex roots.
"""

import numpy as np

import jax.numpy as jnp

from linevis_tpu.kernels.trig_moment_math import (
    TRIG_BIAS,
    _solve_cubic_blinn_c,
    _solve_quartic_neumark_c,
    circle_powers,
    sin_poly,
    transmittance_at_depth_trig_2,
    transmittance_at_depth_trig_3,
    transmittance_at_depth_trig_4,
    wrapping_zone_parameters,
)

_WZP = wrapping_zone_parameters()  # default 0.1*pi wrapping zone


def test_sin_poly_matches_numpy():
    phi = np.linspace(-7.0, 7.0, 257, dtype=np.float32)
    got = np.asarray(sin_poly(jnp.asarray(phi)))
    assert np.max(np.abs(got - np.sin(phi))) < 5e-6


def _tup(x):
    return (jnp.asarray(np.float32(np.real(x))),
            jnp.asarray(np.float32(np.imag(x))))


def test_cubic_blinn_complex_residuals():
    rng = np.random.default_rng(3)
    for _ in range(10):
        roots = np.exp(1j * rng.uniform(0, 2 * np.pi, 3))
        c = np.poly(roots)
        got = _solve_cubic_blinn_c(*[_tup(np.atleast_1d(x)) for x in c])
        for r in got:
            z = complex(np.asarray(r[0])[0], np.asarray(r[1])[0])
            assert abs(np.polyval(c, z)) < 2e-3


def test_quartic_neumark_complex_residuals():
    rng = np.random.default_rng(4)
    for _ in range(10):
        roots = np.exp(1j * rng.uniform(0, 2 * np.pi, 4))
        c = np.poly(roots)
        got = _solve_quartic_neumark_c(*[_tup(np.atleast_1d(x)) for x in c])
        for r in got:
            z = complex(np.asarray(r[0])[0], np.asarray(r[1])[0])
            assert abs(np.polyval(c, z)) < 5e-3


def _trig_moments(depths, alphas, n_half):
    absorb = np.minimum(-np.log(np.maximum(1.0 - alphas, 1e-7)), 10.0)
    b0 = absorb.sum()
    cp = np.exp(1j * _WZP[1] * (depths + 1.0))
    return np.float32(b0), [
        (cp ** k * absorb).sum() / b0 for k in range(1, n_half + 1)
    ]


def _check_at_fragments(n_half, fn, tol):
    rng = np.random.default_rng(42)
    beta = 0.1
    bias = TRIG_BIAS[2 * n_half]
    for _ in range(15):
        n_frag = rng.integers(1, n_half + 1)
        depths = np.sort(rng.uniform(-0.8, 0.8, n_frag)).astype(np.float32)
        alphas = rng.uniform(0.2, 0.7, n_frag).astype(np.float32)
        if n_frag > 1 and np.min(np.diff(depths)) < 0.15:
            continue
        b0, trig = _trig_moments(depths, alphas, n_half)
        tb = [(_tup(m)[0] * jnp.ones(depths.shape),
               _tup(m)[1] * jnp.ones(depths.shape)) for m in trig]
        got = np.asarray(fn(
            jnp.float32(b0), tb, jnp.asarray(depths),
            jnp.float32(bias), jnp.float32(beta),
            jnp.float32(_WZP[1]), jnp.float32(_WZP[2]), jnp.float32(_WZP[3]),
        ))
        want = np.array([
            np.prod([1.0 - a for d, a in zip(depths, alphas) if d < z])
            * (1.0 - alphas[i]) ** beta
            for i, z in enumerate(depths)
        ])
        assert np.isfinite(got).all()
        assert np.max(np.abs(got - want)) < tol, (n_half, got, want)


def test_transmittance_2_trig_moments():
    _check_at_fragments(2, transmittance_at_depth_trig_2, 0.02)


def test_transmittance_3_trig_moments():
    _check_at_fragments(3, transmittance_at_depth_trig_3, 0.03)


def test_transmittance_4_trig_moments():
    _check_at_fragments(4, transmittance_at_depth_trig_4, 0.08)


def test_circle_powers_match_numpy():
    depths = np.linspace(-1, 1, 33, dtype=np.float32)
    powers = circle_powers(jnp.asarray(depths), jnp.float32(_WZP[1]), 4)
    cp = np.exp(1j * _WZP[1] * (depths + 1.0))
    for k, (re, im) in enumerate(powers, start=1):
        assert np.max(np.abs(np.asarray(re) - np.real(cp ** k))) < 5e-5
        assert np.max(np.abs(np.asarray(im) - np.imag(cp ** k))) < 5e-5


def test_transmittance_monotone_single_fragment():
    alpha = 0.5
    b0, trig = _trig_moments(np.array([0.0], np.float32),
                             np.array([alpha], np.float32), 2)
    z = jnp.asarray(np.linspace(-0.9, 0.9, 33, dtype=np.float32))
    tb = [(_tup(m)[0] * jnp.ones(z.shape),
           _tup(m)[1] * jnp.ones(z.shape)) for m in trig]
    got = np.asarray(transmittance_at_depth_trig_2(
        jnp.float32(b0), tb, z, jnp.float32(TRIG_BIAS[4]), jnp.float32(0.0),
        jnp.float32(_WZP[1]), jnp.float32(_WZP[2]), jnp.float32(_WZP[3])))
    assert np.all(got[z < -0.1] > 0.95)
    assert np.all(np.abs(got[np.asarray(z) > 0.1] - (1 - alpha)) < 0.05)
