"""Streamline tracer and analytic field tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linevis_tpu.trace.fields import (
    abc_flow_velocity,
    make_tornado_grid,
    sample_grid_trilinear,
    tornado_velocity,
)
from linevis_tpu.trace.streamline import (
    StreamlineTracingSettings,
    seed_points_plane,
    trace_streamlines,
    trace_streamlines_grid,
)


def test_fields_finite():
    p = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (100, 3)), jnp.float32)
    for f in (tornado_velocity, abc_flow_velocity):
        v = np.asarray(f(p))
        assert v.shape == (100, 3)
        assert np.isfinite(v).all()


def test_grid_sampling_matches_analytic():
    grid = make_tornado_grid(res=48)
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(0.1, 0.9, (64, 3)), jnp.float32)
    v_grid = np.asarray(sample_grid_trilinear(jnp.asarray(grid), p))
    v_exact = np.asarray(tornado_velocity(p))
    # Trilinear interpolation of a 48^3 grid approximates the field.
    err = np.linalg.norm(v_grid - v_exact, axis=-1)
    scale = np.linalg.norm(v_exact, axis=-1).mean()
    assert np.median(err) < 0.15 * scale


def _circular_field(p):
    """v = (-y', x', 0) around center (0.5, 0.5): circular orbits."""
    x = p[..., 0] - 0.5
    y = p[..., 1] - 0.5
    return jnp.stack([-y, x, jnp.zeros_like(x)], axis=-1)


def test_rk4_conserves_radius_better_than_euler():
    seeds = jnp.asarray([[0.8, 0.5, 0.5]], jnp.float32)

    def final_radius(integrator):
        s = StreamlineTracingSettings(
            num_seeds=1, max_steps=200, dt=0.05, integrator=integrator
        )
        traj = trace_streamlines(_circular_field, s, seeds=seeds)
        pts = traj.positions[0][traj.mask[0]]
        r = np.linalg.norm(pts[-1, :2] - 0.5)
        return abs(r - 0.3)

    err_euler = final_radius("explicit_euler")
    err_rk4 = final_radius("rk4")
    assert err_rk4 < err_euler * 0.1
    assert err_rk4 < 1e-3


def test_tracer_terminates_out_of_bounds():
    def outflow(p):
        return jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), p.shape)

    seeds = jnp.asarray([[0.9, 0.5, 0.5]], jnp.float32)
    s = StreamlineTracingSettings(num_seeds=1, max_steps=100, dt=0.05)
    traj = trace_streamlines(outflow, s, seeds=seeds)
    # Terminates after ~0.1/0.05 = 2-3 steps; positions stay in bounds.
    assert traj.num_points[0] < 10
    assert (traj.positions[0][traj.mask[0]] <= 1.0).all()


def test_grid_tracer_and_attributes():
    grid = make_tornado_grid(res=32)
    key = jax.random.PRNGKey(0)
    seeds = seed_points_plane(key, 8, axis=2, offset=0.2)
    s = StreamlineTracingSettings(num_seeds=8, max_steps=64, dt=1 / 64)
    traj = trace_streamlines_grid(grid, s, seeds=seeds)
    assert traj.num_lines == 8
    assert traj.attribute_names == [
        "Velocity Magnitude", "Vorticity Magnitude", "Helicity"
    ]
    assert np.isfinite(traj.attributes).all()
    assert traj.mask.any()
