"""`LineDataScattering`: scattered light paths + line density 3D field.

Behavioral port of `src/LineData/Scattering/LineDataScattering.{hpp:61,cpp}`:
holds trajectories produced by the scattering tracer, the cloud density
grid they were traced through, the ray exit directions (for the spherical
heat map), and builds a **line density 3D field** used by the Line Density
Map renderer and the volumetric path tracer.

The reference builds the field in 3 GPU compute passes — spinlock-guarded
DDA splatting (`ComputeLineDensityField.glsl`), min-max reduction and
normalization (`LineDataScattering.hpp:136-230`).  The TPU rebuild splats
with a deterministic XLA `scatter-add` over fixed sub-samples of every
segment (weight = segment_length / n_sub, i.e. the
`useLineSegmentLengthForDensityField=true` mode): no atomics or spinlocks,
and the result converges to the reference's exact per-voxel chord length
as n_sub grows.  Min-max + normalize are plain `jnp` reductions.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.core.trajectories import (
    RaggedTrajectories,
    Trajectories,
    pad_trajectories,
)
from linevis_tpu.scene.line_data import LineDataFlow
from linevis_tpu.trace.scattering import (
    ScatteringTracingSettings,
    grid_box,
    trace_scattering_rays,
)

__all__ = ["LineDataScattering", "build_line_density_field"]


@partial(jax.jit, static_argnames=("grid_res", "n_sub", "use_length"))
def build_line_density_field(
    positions: jnp.ndarray,  # [L, P, 3]
    mask: jnp.ndarray,  # [L, P]
    b_min: jnp.ndarray,  # [3] world box of the voxel grid
    b_max: jnp.ndarray,
    grid_res: Tuple[int, int, int],  # (Z, Y, X)
    n_sub: int = 8,
    use_length: bool = True,
) -> jnp.ndarray:
    """Splat + min-max + normalize -> [Z, Y, X] field in [0, 1]."""
    a = positions[:, :-1].reshape(-1, 3)
    b = positions[:, 1:].reshape(-1, 3)
    seg_ok = (mask[:, :-1] & mask[:, 1:]).reshape(-1)
    seg_len = jnp.linalg.norm(b - a, axis=-1)
    w = jnp.where(
        seg_ok, (seg_len if use_length else jnp.ones_like(seg_len)) / n_sub,
        0.0,
    )
    nz, ny, nx = grid_res
    res = jnp.asarray([nx, ny, nz], jnp.float32)
    extent = b_max - b_min
    field = jnp.zeros((nz, ny, nx), jnp.float32)
    for i in range(n_sub):
        t = (i + 0.5) / n_sub
        p = a + t * (b - a)
        v = (p - b_min) / extent * res
        # Samples outside the voxel grid contribute nothing (the
        # reference's DDA only visits in-grid voxels,
        # ComputeLineDensityField.glsl traverseVoxelGrid bounds) —
        # clamping them into border voxels would let the long
        # camera->entry segments dominate the normalization.
        inside = jnp.all((v >= 0.0) & (v < res), axis=1)
        xi = jnp.clip(v[:, 0].astype(jnp.int32), 0, nx - 1)
        yi = jnp.clip(v[:, 1].astype(jnp.int32), 0, ny - 1)
        zi = jnp.clip(v[:, 2].astype(jnp.int32), 0, nz - 1)
        field = field.at[zi, yi, xi].add(jnp.where(inside, w, 0.0))
    fmin = jnp.min(field)
    fmax = jnp.max(field)
    return (field - fmin) / jnp.maximum(fmax - fmin, 1e-12)


def smooth_density_field(field: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """Separable Gaussian smoothing (LineDensityFieldSmoothingPass)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / max(radius / 2.0, 1e-6)) ** 2)
    k = k / jnp.sum(k)
    out = field
    for axis in range(3):
        kern = k.reshape([-1 if i == axis else 1 for i in range(3)])
        out = jax.scipy.signal.convolve(out, kern, mode="same")
    return out


class LineDataScattering(LineDataFlow):
    """Scattered-path line data (LineDataScattering.hpp:61)."""

    data_set_type = "scattering"

    def __init__(
        self,
        trajectories: Trajectories,
        cloud_grid: np.ndarray,  # [Z, Y, X] density the paths were traced in
        exit_directions: Optional[np.ndarray] = None,  # [N, 3]
        name: str = "",
    ):
        super().__init__(trajectories, name=name)
        self.cloud_grid = np.asarray(cloud_grid, np.float32)
        self.exit_directions = (
            None if exit_directions is None
            else np.asarray(exit_directions, np.float32)
        )
        b_min, b_max = grid_box(self.cloud_grid.shape)
        self.grid_b_min = b_min
        self.grid_b_max = b_max
        self._density_field: Optional[np.ndarray] = None

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        return tuple(self.cloud_grid.shape)

    @classmethod
    def trace(
        cls,
        cloud_grid: np.ndarray,
        settings: Optional[ScatteringTracingSettings] = None,
        name: str = "scattering",
    ) -> "LineDataScattering":
        """Run the scattering tracer (ScatteringLineTracingRequester role)."""
        settings = settings or ScatteringTracingSettings()
        pos, mask, exit_dirs, exited = trace_scattering_rays(
            cloud_grid, settings
        )
        lines = [pos[i][mask[i]] for i in range(pos.shape[0])]
        lines = [np.asarray(ln, np.float32) for ln in lines if len(ln) >= 2]
        ragged = RaggedTrajectories(
            positions=lines,
            attributes=[
                np.ones((1, len(ln)), np.float32) for ln in lines
            ],
            attribute_names=["Attribute #1"],
        )
        traj = pad_trajectories(ragged)
        return cls(traj, cloud_grid, exit_directions=exit_dirs, name=name)

    def get_line_density_field(self, n_sub: int = 8) -> np.ndarray:
        """[Z, Y, X] normalized density field (cached, dirty-invalidated)."""
        key = ("density_field", n_sub)
        if key not in self._cache:
            keep = self.get_filtered_point_mask()
            self._cache[key] = np.asarray(build_line_density_field(
                jnp.asarray(self.trajectories.positions),
                jnp.asarray(keep),
                jnp.asarray(self.grid_b_min),
                jnp.asarray(self.grid_b_max),
                self.grid_size,
                n_sub=n_sub,
            ))
        return self._cache[key]
