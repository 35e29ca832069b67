"""Monte-Carlo scattering line tracer (delta tracking).

TPU-native rebuild of the reference's CPU scattering tracer
(`src/LineData/Scattering/DtPathTrace.cpp:384-485` `dt_path_trace` and the
ray setup of `ScatteringLineTracingRequester.cpp:380-465`): light paths are
shot through a participating-media density grid; every free-flight /
collision event appends a vertex, producing the scattered *trajectories*
that `LineDataScattering` then renders.

Where the reference iterates one ray at a time with a global hybrid-Taus
RNG, this implementation is a single jitted `lax.scan` over event steps,
vmapped over the whole ray wavefront, with counter-based `jax.random`
per-ray keys — every ray advances one Woodcock event per scan step, all
rays in parallel on the VPU.  Trajectories are fixed-size padded arrays
(max_events vertices) instead of growing vectors; rays that terminate
early simply stop recording (mask=False).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.trace.fields import sample_grid_trilinear

__all__ = [
    "grid_box",
    "dt_path_trace_rays",
    "trace_scattering_rays",
    "ScatteringTracingSettings",
]

_TWO_PI = 6.283185307179586


@dataclasses.dataclass(frozen=True)
class ScatteringTracingSettings:
    """Mirrors reference `ScatteringTracingSettings`
    (`ScatteringLineTracingRequester.hpp:40-57`)."""

    camera_fov_deg: float = 10.0
    camera_position: Tuple[float, float, float] = (-0.5, -0.5, -0.5)
    camera_look_at: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    res_x: int = 1
    res_y: int = 1
    samples_per_pixel: int = 10
    extinction: Tuple[float, float, float] = (1024.0, 1024.0, 1024.0)
    scattering_albedo: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    g: float = 0.2
    seed: int = 42
    max_events: int = 128


def grid_box(grid_shape) -> Tuple[np.ndarray, np.ndarray]:
    """Volume AABB for a [Z, Y, X] grid (DtPathTrace.cpp:295-303
    `get_grid_box`): centered at the origin, max half-extent 0.25."""
    sz, sy, sx = grid_shape[0], grid_shape[1], grid_shape[2]
    max_dim = float(max(sx, sy, sz))
    b_max = np.array([sx, sy, sz], np.float32) / max_dim * 0.25
    return -b_max, b_max


def _box_intersect(b_min, b_max, x, w):
    """Slab test (DtPathTrace.cpp:340-367). Returns (t_min, t_max, hit)."""
    inv = jnp.where(jnp.abs(w) <= 1e-6, jnp.inf * jnp.sign(w + 1e-30), 1.0 / w)
    t0 = (b_min - x) * inv
    t1 = (b_max - x) * inv
    big = 1000.0
    small = jnp.abs(w) <= 1e-6
    # Parallel to a slab: infinite interval if the origin lies between
    # the planes, EMPTY interval otherwise (else off-axis rays parallel
    # to a face would count as hits).
    in_slab = (x >= b_min) & (x <= b_max)
    # Outside: both ends at +big, so after the per-axis min/max sort the
    # entry (max of mins) exceeds every exit (min of maxes) -> miss.
    t0 = jnp.where(small, jnp.where(in_slab, -big, big), t0)
    t1 = jnp.where(small, jnp.where(in_slab, big, big), t1)
    t_min = jnp.maximum(jnp.max(jnp.minimum(t0, t1)), 0.0)
    t_max = jnp.min(jnp.maximum(t0, t1))
    hit = (t_max >= t_min) & (t_max >= 0.0)
    return t_min, t_max, hit


def _orthonormal_basis(d):
    """(DtPathTrace.cpp:229-247)."""
    other = jnp.where(
        jnp.abs(d[2]) >= 0.999,
        jnp.array([1.0, 0.0, 0.0]),
        jnp.array([0.0, 0.0, 1.0]),
    )
    b = jnp.cross(other, d)
    b = b / jnp.maximum(jnp.linalg.norm(b), 1e-12)
    t = jnp.cross(d, b)
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    return b, t


def _sample_phase(key, g, d):
    """Henyey-Greenstein importance sampling
    (DtPathTrace.cpp:265-293 `invert_cdf` + `importance_sample_phase`);
    isotropic for |g| < 1e-3 (`random_direction`)."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1)
    u2 = jax.random.uniform(k2)

    # Isotropic branch.
    r2 = u2 * 2.0 - 1.0
    s = jnp.sqrt(jnp.maximum(1.0 - r2 * r2, 0.0))
    iso = jnp.stack([jnp.cos(_TWO_PI * u1) * s, jnp.sin(_TWO_PI * u1) * s, r2])
    b_iso, t_iso = _orthonormal_basis(-d)
    w_iso = b_iso * iso[0] + t_iso * iso[1] + (-d) * iso[2]

    # HG branch.
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 0.5, g)
    one_minus_g2 = 1.0 - g_safe * g_safe
    t_cdf = one_minus_g2 / (1.0 - g_safe + 2.0 * g_safe * u2)
    cos_theta = (0.5 / g_safe) * (1.0 + g_safe * g_safe - t_cdf * t_cdf)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = u1 * _TWO_PI
    b_hg, t_hg = _orthonormal_basis(d)
    w_hg = (
        sin_theta * jnp.sin(phi) * b_hg
        + sin_theta * jnp.cos(phi) * t_hg
        + cos_theta * d
    )
    return jnp.where(jnp.abs(g) < 1e-3, w_iso, w_hg)


@partial(jax.jit, static_argnames=("max_events",))
def dt_path_trace_rays(
    key: jnp.ndarray,
    grid: jnp.ndarray,  # [Z, Y, X] density in [0, 1]
    origins: jnp.ndarray,  # [N, 3]
    directions: jnp.ndarray,  # [N, 3] normalized
    density: jnp.ndarray,  # [N] extinction multiplier per ray (channel)
    albedo: jnp.ndarray,  # [N] scattering albedo per ray
    g: float,
    max_events: int = 128,
):
    """Woodcock/delta tracking over a ray wavefront.

    Returns (positions [N, max_events+2, 3], mask [N, max_events+2],
    exit_dirs [N, 3], exited [N]) — `exited` is True for rays that left the
    volume (False: absorbed/missed), used by the spherical heat map.
    """
    b_min_np, b_max_np = grid_box(grid.shape)
    b_min = jnp.asarray(b_min_np)
    b_max = jnp.asarray(b_max_np)
    extent = b_max - b_min
    gridf = grid.astype(jnp.float32)[..., None]  # [Z, Y, X, 1]

    def trace_one(key, x0, w0, dens, alb):
        t_min, t_max, hit = _box_intersect(b_min, b_max, x0, w0)
        x_entry = x0 + w0 * t_min
        d0 = t_max - t_min

        def step(state, k):
            x, w, d, alive = state
            k1, k2, k3 = jax.random.split(k, 3)
            u1 = jax.random.uniform(k1)
            t = jnp.where(
                dens <= 1e-5,
                1e7,
                -jnp.log(jnp.maximum(1e-11, 1.0 - u1)) / jnp.maximum(dens, 1e-5),
            )
            x_new = x + w * t
            exited = t >= d
            tpos = (x_new - b_min) / extent
            # sample_grid_trilinear expects (x, y, z) order in [0,1].
            prob_ext = sample_grid_trilinear(gridf, tpos)[..., 0]
            m_t = prob_ext * dens
            m_s = m_t * alb
            pa = (m_t - m_s) / jnp.maximum(dens, 1e-5)
            pn = 1.0 - m_t / jnp.maximum(dens, 1e-5)
            xi = jax.random.uniform(k2)
            absorbed = (~exited) & (xi < pa)
            scattered = (~exited) & (~absorbed) & (xi < 1.0 - pn)

            w_scat = _sample_phase(k3, g, w)
            w_new = jnp.where(scattered, w_scat, w)
            t2_min, t2_max, hit2 = _box_intersect(b_min, b_max, x_new, w_new)
            d_new = jnp.where(
                exited,
                d,
                jnp.where(
                    scattered,
                    jnp.where(hit2, t2_max - t2_min, 0.0),
                    d - t,  # null collision (or absorption: d unused)
                ),
            )
            x_out = jnp.where(scattered & hit2, x_new + w_new * t2_min, x_new)
            alive_new = alive & (~exited) & (~absorbed) & ~(scattered & ~hit2)
            # Record the event position while the ray was alive this step
            # (the reference records the exit point too, then breaks).
            return (x_out, w_new, d_new, alive_new), (
                x_new, alive, exited & alive, w_new,
            )

        keys = jax.random.split(key, max_events)
        init = (x_entry, w0, d0, hit)
        (xf, wf, df, alive_f), (pts, recs, exits, ws) = jax.lax.scan(
            step, init, keys
        )
        # First two vertices: camera position and volume entry point
        # (DtPathTrace.cpp:415-422).
        positions = jnp.concatenate([
            jnp.stack([x0, x_entry], axis=0), pts
        ], axis=0)
        mask = jnp.concatenate([jnp.stack([hit, hit]), recs], axis=0)
        exited_any = jnp.any(exits)
        exit_dir = wf / jnp.maximum(jnp.linalg.norm(wf), 1e-12)
        return positions, mask, exit_dir, exited_any

    keys = jax.random.split(key, origins.shape[0])
    return jax.vmap(trace_one)(keys, origins, directions, density, albedo)


def trace_scattering_rays(
    grid: np.ndarray,
    settings: ScatteringTracingSettings,
):
    """Full requester protocol (ScatteringLineTracingRequester.cpp:405-465):
    focal-plane ray grid, `samples_per_pixel` stochastic paths per pixel,
    extinction/albedo channel cycling with the pass number.

    Returns (positions [N, Pmax, 3] np, mask [N, Pmax] np,
    exit_dirs [N, 3] np, exited [N] np bool).
    """
    cam = np.asarray(settings.camera_position, np.float32)
    look = np.asarray(settings.camera_look_at, np.float32)
    fwd = look - cam
    fwd = fwd / max(np.linalg.norm(fwd), 1e-12)
    y_axis = np.array([0.0, -1.0, 0.0], np.float32)
    x_axis = np.cross(fwd, y_axis)
    y_axis = np.cross(x_axis, fwd)

    focal_length = 1.0
    grid_w = np.tan(np.radians(settings.camera_fov_deg) / 2.0) * 2 * focal_length
    grid_h = settings.res_y * (grid_w / settings.res_x)
    p00 = cam + fwd * focal_length - 0.5 * y_axis * grid_h - 0.5 * x_axis * grid_w

    dirs = []
    dens = []
    albs = []
    ext = np.asarray(settings.extinction, np.float32)
    alb = np.asarray(settings.scattering_albedo, np.float32)
    for y in range(settings.res_y):
        yp = 0.5 if settings.res_y < 2 else y / (settings.res_y - 1)
        for x in range(settings.res_x):
            xp = 0.5 if settings.res_x < 2 else x / (settings.res_x - 1)
            p = p00 + x_axis * (xp * grid_w) + y_axis * (yp * grid_h)
            d = p - cam
            d = d / max(np.linalg.norm(d), 1e-12)
            for i in range(settings.samples_per_pixel):
                dirs.append(d)
                dens.append(ext[i % 3])
                albs.append(alb[i % 3])

    n = len(dirs)
    origins = np.broadcast_to(cam, (n, 3)).astype(np.float32)
    pos, mask, exit_dirs, exited = dt_path_trace_rays(
        jax.random.PRNGKey(settings.seed),
        jnp.asarray(grid),
        jnp.asarray(origins),
        jnp.asarray(np.stack(dirs).astype(np.float32)),
        jnp.asarray(np.asarray(dens, np.float32)),
        jnp.asarray(np.asarray(albs, np.float32)),
        float(settings.g),
        max_events=settings.max_events,
    )
    return (
        np.asarray(pos), np.asarray(mask), np.asarray(exit_dirs),
        np.asarray(exited),
    )
