"""Analytic vector fields + structured-grid sampling.

The reference generates the ABC flow analytically
(`src/LineData/Flow/Loader/AbcFlowGenerator.cpp`) and loads the classic
Crawfis "Tornado" dataset from file; here the Crawfis 2003 tornado field is
implemented analytically (Crawfis's public tornado.c formula) so benchmark
scenes are reproducible without external downloads.

Grid sampling mirrors the trilinear interpolation of
`StreamlineTracingGrid` (`src/LineData/Flow/StreamlineTracingGrid.hpp`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tornado_velocity(p: jnp.ndarray, time: float = 0.0) -> jnp.ndarray:
    """Crawfis tornado velocity at p in [0,1]^3. p: [..., 3] -> [..., 3]."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    xc = 0.5 + 0.1 * jnp.sin(0.04 * time + 10.0 * z)
    yc = 0.5 + 0.1 * jnp.cos(0.03 * time + 3.0 * z)
    r = 0.1 + 0.4 * z * z + 0.1 * z * jnp.sin(8.0 * z)
    r2 = 0.2 + 0.1 * z
    temp = jnp.sqrt((y - yc) ** 2 + (x - xc) ** 2)
    scale = jnp.abs(r - temp)
    scale = jnp.where(scale > r2, 0.8 - scale, 1.0)
    z0 = jnp.maximum(0.1 * (0.1 - temp * z), 0.0)
    temp = jnp.sqrt(temp * temp + z0 * z0)
    eps = 1e-10
    scale = (r + r2 - temp) * scale / (temp + eps)
    scale = scale / (1.0 + z)
    vx = scale * (y - yc) + 0.1 * (x - xc)
    vy = scale * -(x - xc) + 0.1 * (y - yc)
    vz = scale * z0
    return jnp.stack([vx, vy, vz], axis=-1)


def abc_flow_velocity(
    p: jnp.ndarray,
    a: float = 1.7320508075688772,  # sqrt(3)
    b: float = 1.4142135623730951,  # sqrt(2)
    c: float = 1.0,
) -> jnp.ndarray:
    """Arnold-Beltrami-Childress flow (reference AbcFlowGenerator.cpp)."""
    two_pi = 2.0 * jnp.pi
    x, y, z = p[..., 0] * two_pi, p[..., 1] * two_pi, p[..., 2] * two_pi
    vx = a * jnp.sin(z) + c * jnp.cos(y)
    vy = b * jnp.sin(x) + a * jnp.cos(z)
    vz = c * jnp.sin(y) + b * jnp.cos(x)
    return jnp.stack([vx, vy, vz], axis=-1)


def make_tornado_grid(res: int = 64, time: float = 0.0) -> np.ndarray:
    """Sample the tornado field onto a [res, res, res, 3] grid over [0,1]^3."""
    axis = np.linspace(0.0, 1.0, res, dtype=np.float32)
    gz, gy, gx = np.meshgrid(axis, axis, axis, indexing="ij")
    p = jnp.stack([gx, gy, gz], axis=-1)
    return np.asarray(tornado_velocity(p, time=time), np.float32)


def make_abc_flow_grid(res: int = 64) -> np.ndarray:
    axis = np.linspace(0.0, 1.0, res, dtype=np.float32)
    gz, gy, gx = np.meshgrid(axis, axis, axis, indexing="ij")
    p = jnp.stack([gx, gy, gz], axis=-1)
    return np.asarray(abc_flow_velocity(p), np.float32)


def sample_grid_trilinear(grid: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of a [Z, Y, X, C] grid at p in [0,1]^3 ([..., 3]).

    Out-of-bounds coordinates are clamped (matching the reference tracer's
    boundary clamp before termination checks).
    """
    nz, ny, nx = grid.shape[0], grid.shape[1], grid.shape[2]
    fx = jnp.clip(p[..., 0], 0.0, 1.0) * (nx - 1)
    fy = jnp.clip(p[..., 1], 0.0, 1.0) * (ny - 1)
    fz = jnp.clip(p[..., 2], 0.0, 1.0) * (nz - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ny - 2)
    z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, nz - 2)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    tz = (fz - z0)[..., None]

    def g(dz, dy, dx):
        return grid[z0 + dz, y0 + dy, x0 + dx]

    c00 = g(0, 0, 0) * (1 - tx) + g(0, 0, 1) * tx
    c01 = g(0, 1, 0) * (1 - tx) + g(0, 1, 1) * tx
    c10 = g(1, 0, 0) * (1 - tx) + g(1, 0, 1) * tx
    c11 = g(1, 1, 0) * (1 - tx) + g(1, 1, 1) * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz
