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


def test_rkf45_adaptive_matches_fixed_on_smooth_field():
    """Adaptive RKF45 with tight tolerance converges to the same endpoints
    as dense fixed-step RK4 on a smooth rotation field."""
    import numpy as np
    import jax.numpy as jnp

    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamlines,
    )

    def rot_field(p):
        # rotation about z, center (0.5, 0.5): bounded, smooth
        return jnp.stack(
            [-(p[..., 1] - 0.5), p[..., 0] - 0.5, jnp.zeros_like(p[..., 0])],
            axis=-1,
        )

    seeds = jnp.asarray(np.array([[0.7, 0.5, 0.5], [0.6, 0.6, 0.5]],
                                 np.float32))
    ref = trace_streamlines(
        rot_field,
        StreamlineTracingSettings(max_steps=256, dt=1.0 / 256.0,
                                  integrator="rk4"),
        seeds=seeds,
    )
    ada = trace_streamlines(
        rot_field,
        StreamlineTracingSettings(
            max_steps=256, dt=1.0 / 256.0, integrator="rkf45",
            adaptive=True, tolerance=1e-7, dt_min=1.0 / 1024.0,
            dt_max=1.0 / 64.0,
        ),
        seeds=seeds,
    )
    # Endpoints land on the same circle radius (rotation preserves radius).
    for traj in (ref, ada):
        for i in range(2):
            n = traj.num_points[i]
            p = traj.positions[i, : n]
            r = np.linalg.norm(p[:, :2] - 0.5, axis=1)
            np.testing.assert_allclose(r, r[0], atol=2e-3)
    # Adaptive with dt_max > dt uses fewer recorded steps.
    assert ada.num_points.max() <= ref.num_points.max()
    # Masks are contiguous prefixes after compaction.
    m = ada.mask
    for i in range(m.shape[0]):
        n = m[i].sum()
        assert m[i, :n].all() and not m[i, n:].any()


def test_proximity_loop_termination():
    """A closed circular orbit terminates when it returns near its seed."""
    import numpy as np
    import jax.numpy as jnp

    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamlines,
    )

    def rot_field(p):
        return jnp.stack(
            [-(p[..., 1] - 0.5), p[..., 0] - 0.5, jnp.zeros_like(p[..., 0])],
            axis=-1,
        )

    seeds = jnp.asarray(np.array([[0.7, 0.5, 0.5]], np.float32))
    free = trace_streamlines(
        rot_field,
        StreamlineTracingSettings(max_steps=512, dt=1.0 / 32.0,
                                  integrator="rk4"),
        seeds=seeds,
    )
    looped = trace_streamlines(
        rot_field,
        StreamlineTracingSettings(
            max_steps=512, dt=1.0 / 32.0, integrator="rk4",
            termination_distance=0.02, loop_min_gap=16,
        ),
        seeds=seeds,
    )
    # Orbit circumference 2*pi*0.2 ~ 1.26; dt=1/32 with |v|=0.2 gives step
    # ~0.2/32 -> ~200 steps/orbit. Free tracing runs all 512 steps; loop
    # termination stops after ~one orbit.
    assert free.num_points[0] == 513
    assert looped.num_points[0] < 300, looped.num_points[0]


def test_streamribbons_orthogonal_right_vectors():
    import numpy as np
    import jax.numpy as jnp

    from linevis_tpu.trace.fields import tornado_velocity
    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamribbons,
    )

    traj, ribbons = trace_streamribbons(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=4, max_steps=32, dt=1.0 / 128.0),
    )
    assert ribbons.shape == traj.positions.shape
    v = np.asarray(tornado_velocity(jnp.asarray(traj.positions)))
    t = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    dots = np.abs(np.sum(ribbons * t, axis=-1))[traj.mask]
    assert dots.max() < 1e-3, dots.max()
    norms = np.linalg.norm(ribbons, axis=-1)[traj.mask]
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_flow_ribbon_mesh():
    from linevis_tpu.scene.line_data import LineDataFlow
    from linevis_tpu.trace.fields import tornado_velocity
    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamribbons,
    )

    traj, ribbons = trace_streamribbons(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=3, max_steps=16, dt=1.0 / 128.0),
    )
    ld = LineDataFlow(traj)
    ld.set_ribbon_directions(ribbons)
    mesh = ld.get_ribbon_mesh(band_width=0.01, num_subdivisions=6)
    import numpy as np
    assert np.isfinite(np.asarray(mesh.positions)).all()
    # Helicity band variant also builds.
    mesh2 = ld.get_helicity_band_mesh(band_width=0.01, num_subdivisions=6)
    assert np.isfinite(np.asarray(mesh2.positions)).all()
