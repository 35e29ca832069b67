"""Voxel Ray Casting: quantized voxel-curve rendering.

Port of the reference's VRC mode (Kanzler et al. 2018;
`src/Renderers/VRC/VoxelCurveDiscretizer{Cpu,Gpu}.cpp`,
`Data/Shaders/Renderers/VRC/TraverseGrid.glsl:51-135`): curves are
**discretized into a voxel grid** — every line segment is clipped against
each voxel it crosses and its endpoints are quantized to a small in-voxel
lattice (the reference quantizes to voxel-face positions with
QUANTIZATION_RESOLUTION steps, `VoxelData.hpp:57-74`) — then rendered with
analytic ray-tube intersections per voxel.

TPU-first redesign of the traversal: the reference walks every primary ray
through the grid with Amanatides-Woo DDA because a GPU ray caster has no
other way to find the voxels a ray crosses.  Here the quantized per-voxel
segments are *binned to screen tiles* and rendered by the existing
sort-carried capsule kernel (`kernels/raster_capsule.py`) — the same
front-to-back, nearest-hit analytic intersection, with the tile binning
playing the DDA's role (same redesign the tile rasterizer applies to
meshlet culling, SURVEY §7).  The visual signature of VRC — voxel-snapped,
quantized curves — is preserved exactly, because the geometry itself is
the discretized set.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.render.tube_raster import CapsuleScene

__all__ = ["discretize_curves", "VoxelRayCastingRenderer"]


@partial(jax.jit, static_argnames=("grid_resolution", "quantization", "span"))
def discretize_curves(
    positions: jnp.ndarray,  # [L, P, 3]
    mask: jnp.ndarray,  # [L, P]
    attrs: jnp.ndarray,  # [L, P]
    grid_resolution: int = 128,
    quantization: int = 8,
    span: int = 3,
):
    """Clip every segment to each voxel it crosses; quantize endpoints to a
    `quantization`-step in-voxel lattice.

    Returns (a [3, N], b [3, N], attr0 [N], attr1 [N], valid [N]) with
    N = span^3 * S (invalid pairs masked out).
    """
    pos = jnp.asarray(positions, jnp.float32)
    L, P = pos.shape[:2]
    cf = pos.reshape(L * P, 3).T.reshape(3, L, P)
    a = cf[:, :, :-1].reshape(3, -1)
    b = cf[:, :, 1:].reshape(3, -1)
    m = jnp.asarray(mask)
    seg_ok = (m[:, :-1] & m[:, 1:]).reshape(-1)
    at = jnp.asarray(attrs, jnp.float32)
    a0 = at[:, :-1].reshape(-1)
    a1 = at[:, 1:].reshape(-1)
    S = a.shape[1]
    G = grid_resolution

    big = jnp.float32(3e38)
    lo_all = jnp.min(jnp.where(seg_ok[None], jnp.minimum(a, b), big), axis=1)
    hi_all = jnp.max(jnp.where(seg_ok[None], jnp.maximum(a, b), -big), axis=1)
    extent = jnp.maximum(hi_all - lo_all, 1e-6)
    cell = extent / G
    inv_cell = 1.0 / cell

    c0 = jnp.clip(
        jnp.floor((jnp.minimum(a, b) - lo_all[:, None]) * inv_cell[:, None])
        .astype(jnp.int32), 0, G - 1,
    )
    c1 = jnp.clip(
        jnp.floor((jnp.maximum(a, b) - lo_all[:, None]) * inv_cell[:, None])
        .astype(jnp.int32), 0, G - 1,
    )

    d = jnp.arange(span, dtype=jnp.int32)
    # candidate cells [span, span, span, S] per axis
    cx = c0[0][None, None, None, :] + d[None, None, :, None]
    cy = c0[1][None, None, None, :] + d[None, :, None, None]
    cz = c0[2][None, None, None, :] + d[:, None, None, None]
    in_win = (
        (cx <= c1[0][None, None, None, :])
        & (cy <= c1[1][None, None, None, :])
        & (cz <= c1[2][None, None, None, :])
        & seg_ok[None, None, None, :]
    )
    n = span ** 3
    full = (span, span, span, S)
    cxyz = jnp.stack(
        [
            jnp.broadcast_to(cx, full).reshape(n, S),
            jnp.broadcast_to(cy, full).reshape(n, S),
            jnp.broadcast_to(cz, full).reshape(n, S),
        ],
        axis=0,
    ).astype(jnp.float32)  # [3, n, S]
    in_win = jnp.broadcast_to(in_win, full).reshape(n, S)

    cell_lo = lo_all[:, None, None] + cxyz * cell[:, None, None]
    cell_hi = cell_lo + cell[:, None, None]

    pa = a[:, None, :]  # [3, 1, S]
    ab = (b - a)[:, None, :]
    inv_ab = jnp.where(jnp.abs(ab) < 1e-12, 1e12 * jnp.sign(ab + 1e-30), 1.0 / ab)
    t_lo = (cell_lo - pa) * inv_ab
    t_hi = (cell_hi - pa) * inv_ab
    t_in = jnp.clip(jnp.max(jnp.minimum(t_lo, t_hi), axis=0), 0.0, 1.0)
    t_out = jnp.clip(jnp.min(jnp.maximum(t_lo, t_hi), axis=0), 0.0, 1.0)
    valid = in_win & (t_out > t_in + 1e-7)

    q0 = pa + t_in[None] * ab  # [3, n, S]
    q1 = pa + t_out[None] * ab

    def quant(q):
        local = (q - cell_lo) / cell[:, None, None]
        snapped = jnp.round(local * quantization) / quantization
        return cell_lo + snapped * cell[:, None, None]

    q0 = quant(q0)
    q1 = quant(q1)
    # Quantization can collapse tiny clips to a point — drop those.
    nonzero = jnp.sum((q1 - q0) ** 2, axis=0) > 1e-16
    valid = valid & nonzero

    att0 = a0[None, :] + t_in * (a1 - a0)[None, :]
    att1 = a0[None, :] + t_out * (a1 - a0)[None, :]
    return (
        q0.reshape(3, n * S),
        q1.reshape(3, n * S),
        att0.reshape(-1),
        att1.reshape(-1),
        valid.reshape(-1),
    )


class VoxelRayCastingRenderer:
    """Registry renderer for RENDERING_MODE_VOXEL_RAY_CASTING."""

    name = "Voxel Ray Casting"

    def __init__(self, settings=None):
        from linevis_tpu.render.renderer import LineRenderer

        # Reuse LineRenderer plumbing by containment (settings/TF).
        self._base = LineRenderer(settings)
        self.grid_resolution = 128
        self.quantization = 8
        if settings is not None and settings.has_key("grid_resolution"):
            self.grid_resolution = settings.get_int("grid_resolution")
        self._scene: Optional[CapsuleScene] = None

    @property
    def line_data(self):
        return self._base.line_data

    def set_line_data(self, line_data) -> None:
        self._base.set_line_data(line_data)
        self._scene = None

    def set_transfer_function(self, tf) -> None:
        self._base.set_transfer_function(tf)

    def set_new_settings(self, settings) -> None:
        self._base.set_new_settings(settings)
        if settings.has_key("grid_resolution"):
            self.grid_resolution = settings.get_int("grid_resolution")
            self._scene = None

    def _quantized_scene(self) -> CapsuleScene:
        if self._scene is None:
            ld = self._base.line_data
            traj = ld.trajectories
            mask = ld.get_filtered_point_mask()
            # Size the static cell window so every segment's full extent is
            # covered; lower the grid resolution for long-segment scenes to
            # bound the span^3 pair expansion.
            pos = np.asarray(traj.positions)
            m2 = mask[:, :-1] & mask[:, 1:]
            seg_ext = np.abs(pos[:, 1:] - pos[:, :-1])[m2]
            lo = pos[mask].min(axis=0)
            hi = pos[mask].max(axis=0)
            extent = float(np.maximum(hi - lo, 1e-6).max())
            res = self.grid_resolution
            max_seg = float(seg_ext.max()) if seg_ext.size else 0.0
            span = int(np.ceil(max_seg / (extent / res))) + 2
            while span > 8 and res > 8:
                res //= 2
                span = int(np.ceil(max_seg / (extent / res))) + 2
            q0, q1, a0, a1, valid = discretize_curves(
                jnp.asarray(traj.positions),
                jnp.asarray(mask),
                jnp.asarray(ld.selected_attributes()),
                grid_resolution=res,
                quantization=self.quantization,
                span=span,
            )
            self._scene = CapsuleScene(
                a=q0, ba=q1 - q0, attr0=a0, dattr=a1 - a0, mask=valid,
                cap_a=jnp.ones_like(a0),
                radius=ld.line_width / 2.0,
            )
        return self._scene

    def render(self, camera) -> np.ndarray:
        from linevis_tpu.render.tube_raster import render_tubes_image

        return render_tubes_image(
            self._quantized_scene(), camera,
            settings=self._base._raster_settings(camera),
        )
