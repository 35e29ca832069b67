"""Shared setup for examples/benchmarks: compile cache + tornado scene."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from linevis_tpu.core.trajectories import normalize_attributes, normalize_trajectories
from linevis_tpu.geometry.tubes import build_tube_triangle_mesh
from linevis_tpu.render.camera import Camera
from linevis_tpu.trace.fields import tornado_velocity
from linevis_tpu.trace.streamline import StreamlineTracingSettings, trace_streamlines


def tornado_scene(num_seeds=512, max_steps=400, radius=0.0015, subdivisions=8):
    traj = trace_streamlines(
        tornado_velocity,
        StreamlineTracingSettings(
            num_seeds=num_seeds, max_steps=max_steps, dt=1.0 / 150.0
        ),
    )
    traj = normalize_attributes(normalize_trajectories(traj))
    mesh = build_tube_triangle_mesh(
        traj.positions, traj.mask, traj.attributes[:, 0], radius=radius,
        num_subdivisions=subdivisions,
    )
    cam = Camera(position=(0.0, 0.1, 1.2), width=800, height=600)
    return traj, mesh, cam


def timeit(f, *a, n=10):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / n, r
