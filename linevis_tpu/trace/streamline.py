"""Streamline tracer as batched XLA scans.

Behavioral reference: `src/LineData/Flow/StreamlineTracingGrid.{hpp,cpp}`
(integrators enum `StreamlineTracingDefines.hpp:63-81`, settings struct
`:148-180`, seeders `StreamlineSeeder.hpp`). TPU-native redesign: every
seed integrates in lockstep under `vmap(scan)` with static step counts and
termination masks instead of per-line while loops — all seeds advance in a
single fused XLA computation, replacing the reference's TBB worker thread.

Derived attributes mirror the reference's computed fields (velocity
magnitude, vorticity magnitude, helicity).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.core.trajectories import Trajectories
from linevis_tpu.trace.fields import sample_grid_trilinear

# Integrator names (reference StreamlineTracingDefines.hpp:63-81)
INTEGRATOR_EXPLICIT_EULER = "explicit_euler"
INTEGRATOR_HEUN = "heun"
INTEGRATOR_MIDPOINT = "midpoint"
INTEGRATOR_RK4 = "rk4"
INTEGRATOR_RKF45 = "rkf45"


@dataclasses.dataclass(frozen=True)
class StreamlineTracingSettings:
    """Subset of reference `StreamlineTracingSettings` we support headlessly."""

    num_seeds: int = 256
    max_steps: int = 512
    dt: float = 1.0 / 256.0
    integrator: str = INTEGRATOR_RK4
    terminate_speed: float = 1e-6
    seed: int = 42
    forward: bool = True
    backward: bool = False


def seed_points_volume(key: jax.Array, n: int) -> jnp.ndarray:
    """Uniform random seeds in [0,1]^3 (reference VolumeSeeder)."""
    return jax.random.uniform(key, (n, 3), jnp.float32)


def seed_points_plane(
    key: jax.Array, n: int, axis: int = 2, offset: float = 0.1
) -> jnp.ndarray:
    """Random seeds on an axis-aligned plane (reference PlaneSeeder)."""
    p = jax.random.uniform(key, (n, 3), jnp.float32)
    return p.at[:, axis].set(offset)


def _step(field: Callable, p: jnp.ndarray, dt: float, method: str) -> jnp.ndarray:
    v1 = field(p)
    if method == INTEGRATOR_EXPLICIT_EULER:
        return p + dt * v1
    if method == INTEGRATOR_MIDPOINT:
        return p + dt * field(p + 0.5 * dt * v1)
    if method == INTEGRATOR_HEUN:
        v2 = field(p + dt * v1)
        return p + dt * 0.5 * (v1 + v2)
    if method == INTEGRATOR_RK4:
        k1 = v1
        k2 = field(p + 0.5 * dt * k1)
        k3 = field(p + 0.5 * dt * k2)
        k4 = field(p + dt * k3)
        return p + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    if method == INTEGRATOR_RKF45:
        # Fixed-step Fehlberg 4(5) using the 5th-order solution; step-size
        # adaptation is replaced by a static dt (XLA-friendly; the reference
        # adapts dt at `StreamlineTracingGrid.hpp:138-145`).
        k1 = field(p)
        k2 = field(p + dt * (k1 / 4.0))
        k3 = field(p + dt * (3.0 / 32.0 * k1 + 9.0 / 32.0 * k2))
        k4 = field(
            p + dt * (1932.0 / 2197.0 * k1 - 7200.0 / 2197.0 * k2 + 7296.0 / 2197.0 * k3)
        )
        k5 = field(
            p
            + dt
            * (439.0 / 216.0 * k1 - 8.0 * k2 + 3680.0 / 513.0 * k3 - 845.0 / 4104.0 * k4)
        )
        k6 = field(
            p
            + dt
            * (
                -8.0 / 27.0 * k1
                + 2.0 * k2
                - 3544.0 / 2565.0 * k3
                + 1859.0 / 4104.0 * k4
                - 11.0 / 40.0 * k5
            )
        )
        return p + dt * (
            16.0 / 135.0 * k1
            + 6656.0 / 12825.0 * k3
            + 28561.0 / 56430.0 * k4
            - 9.0 / 50.0 * k5
            + 2.0 / 55.0 * k6
        )
    raise ValueError(f"Unknown integrator {method!r}")


def _vorticity(field: Callable, p: jnp.ndarray, h: float = 1e-3) -> jnp.ndarray:
    """Curl via central differences (matches grid-based derived fields)."""

    def d(axis):
        e = jnp.zeros((3,), jnp.float32).at[axis].set(h)
        return (field(p + e) - field(p - e)) / (2.0 * h)

    dv_dx, dv_dy, dv_dz = d(0), d(1), d(2)
    return jnp.stack(
        [
            dv_dy[..., 2] - dv_dz[..., 1],
            dv_dz[..., 0] - dv_dx[..., 2],
            dv_dx[..., 1] - dv_dy[..., 0],
        ],
        axis=-1,
    )


@partial(jax.jit, static_argnames=("field", "settings"))
def _trace_batch(
    field: Callable, settings: StreamlineTracingSettings, seeds: jnp.ndarray
):
    dt = settings.dt if settings.forward else -settings.dt

    def one_step(carry, _):
        p, alive = carry
        p_new = _step(field, p, dt, settings.integrator)
        in_bounds = jnp.all((p_new >= 0.0) & (p_new <= 1.0), axis=-1)
        v = field(p_new)
        speed = jnp.linalg.norm(v, axis=-1)
        alive_new = alive & in_bounds & (speed > settings.terminate_speed)
        p_out = jnp.where(alive_new[..., None], p_new, p)
        return (p_out, alive_new), (p_out, alive_new)

    alive0 = jnp.ones(seeds.shape[:-1], bool)
    (_, _), (positions, alive) = jax.lax.scan(
        one_step, (seeds, alive0), None, length=settings.max_steps
    )
    # [steps, N, 3] -> [N, steps+1, 3]; prepend seeds
    positions = jnp.concatenate([seeds[None], positions], axis=0).swapaxes(0, 1)
    mask = jnp.concatenate([alive0[None], alive], axis=0).swapaxes(0, 1)

    v = field(positions)
    vel_mag = jnp.linalg.norm(v, axis=-1)
    vort = _vorticity(field, positions)
    vort_mag = jnp.linalg.norm(vort, axis=-1)
    helicity = jnp.sum(v * vort, axis=-1)
    attributes = jnp.stack([vel_mag, vort_mag, helicity], axis=1)  # [N, 3, P]
    return positions, attributes, mask


def trace_streamlines(
    field: Callable[[jnp.ndarray], jnp.ndarray],
    settings: StreamlineTracingSettings = StreamlineTracingSettings(),
    seeds: Optional[jnp.ndarray] = None,
) -> Trajectories:
    """Trace streamlines through an analytic velocity field.

    Returns padded `Trajectories` with attributes
    [Velocity Magnitude, Vorticity Magnitude, Helicity].
    """
    if seeds is None:
        key = jax.random.PRNGKey(settings.seed)
        seeds = seed_points_volume(key, settings.num_seeds)
    positions, attributes, mask = _trace_batch(field, settings, seeds)
    num_points = np.asarray(jnp.sum(mask, axis=1), np.int32)
    return Trajectories(
        positions=np.asarray(positions),
        attributes=np.asarray(attributes),
        mask=np.asarray(mask),
        num_points=num_points,
        attribute_names=["Velocity Magnitude", "Vorticity Magnitude", "Helicity"],
    )


def trace_streamlines_grid(
    grid: jnp.ndarray,
    settings: StreamlineTracingSettings = StreamlineTracingSettings(),
    seeds: Optional[jnp.ndarray] = None,
) -> Trajectories:
    """Trace streamlines through a [Z, Y, X, 3] velocity grid."""
    grid = jnp.asarray(grid)

    def field(p):
        return sample_grid_trilinear(grid, p)

    if seeds is None:
        key = jax.random.PRNGKey(settings.seed)
        seeds = seed_points_volume(key, settings.num_seeds)
    positions, attributes, mask = _trace_batch(field, settings, seeds)
    num_points = np.asarray(jnp.sum(mask, axis=1), np.int32)
    return Trajectories(
        positions=np.asarray(positions),
        attributes=np.asarray(attributes),
        mask=np.asarray(mask),
        num_points=num_points,
        attribute_names=["Velocity Magnitude", "Vorticity Magnitude", "Helicity"],
    )
