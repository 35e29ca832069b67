"""Decoupled opacity optimization (Günther et al. 2017).

Reference: `src/Renderers/OIT/OpacityOptimizationRenderer.*` — the 9-step
frame documented in SURVEY §3.4. TPU-native realization:

1. Importance gather at reduced resolution: the MLAB capsule kernel in
   'gather' mode stores per-pixel front-to-back nodes of (depth,
   importance g_i, segment id) — the reference's half-res PPLL gather
   (`GeometryPassOpacities.glsl`).
2. Per-pixel opacity solve (Algorithm 1; `LinkedListResolveOpacities.glsl`):
   alpha_i = p / (p + (1-g_i)^(2 lambda) * (r*g_f + q*g_b)) — unrolled
   elementwise over the K nodes.
3. Per-segment opacity = min over all pixels (the reference's atomicMin
   becomes one deterministic scatter-min).
4. `s` Laplacian smoothing iterations over the segment chain
   (`LaplacianSmoothing.glsl`): the [L, P-1] lattice makes neighbor access
   a shift, not a connectivity-buffer gather.
5. Per-vertex opacity + temporal exponential smoothing
   (`ComputePerVertexOpacities.glsl`).
6. Final transparent render with per-segment alpha rows.

Defaults mirror the reference (`OpacityOptimizationRenderer.hpp:197-206`):
q=2000, r=20, s=15, lambda=2, relaxation=0.1, temporal=0.15, half-res
opacity pass.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.kernels.raster_capsule_oit import rasterize_capsules_mlab
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.tube_raster import (
    CapsuleScene,
    _proj_constants,
    prepare_capsule_frame,
)
__all__ = ["OpacityOptimizationSettings", "render_opacity_optimization"]


@dataclasses.dataclass(frozen=True)
class OpacityOptimizationSettings:
    q: float = 2000.0
    r: float = 20.0
    s: int = 15
    lambda_: float = 2.0
    relaxation: float = 0.1
    temporal_smoothing: float = 0.15
    opacity_resolution_scale: float = 0.5  # half-res importance pass
    gather_k: int = 8
    render_k: int = 8


@partial(
    jax.jit,
    static_argnames=("settings", "oo", "num_lines", "pts_per_line",
                     "band_axis", "n_bands"),
)
def _opacity_solve(
    scene: CapsuleScene,
    view_proj,
    camera_position,
    proj_ab,
    prev_vertex_opacity,  # [L, P] previous frame (temporal smoothing)
    settings: RasterSettings,
    oo: OpacityOptimizationSettings,
    num_lines: int,
    pts_per_line: int,
    band_axis: str = None,  # inside shard_map: this chip gathers one band
    n_bands: int = 1,
):
    """Steps 1-5: importance gather -> smoothed per-vertex opacities.

    With `band_axis` (under shard_map), each chip gathers importance over
    its own horizontal band of the half-res frame, and the per-segment
    min/visibility reductions become cross-chip `pmin`/`pmax` collectives
    — per-segment reduction sharding (SURVEY §2.10; the atomicMin of
    OpacityOptimizationRenderer.cpp becomes a deterministic mesh-wide
    min).  The smoothing chain then runs replicated (it is [L, P]-sized,
    trivial next to the gather)."""
    scale = oo.opacity_resolution_scale
    w2 = max(int(settings.width * scale) // 32 * 32, 32)
    h2 = max(int(settings.height * scale) // 16 * 16, 16)
    if band_axis is not None:
        band_h = h2 // n_bands
        y_off = (jax.lax.axis_index(band_axis) * band_h).astype(jnp.float32)
        s2 = dataclasses.replace(settings, width=w2, height=band_h)
        csr, params, _ = prepare_capsule_frame(
            scene, view_proj, camera_position, proj_ab, s2,
            y_offset=y_off, full_height=h2,
        )
        w2, h2 = w2, band_h
    else:
        s2 = dataclasses.replace(settings, width=w2, height=h2)
        csr, params, _ = prepare_capsule_frame(
            scene, view_proj, camera_position, proj_ab, s2
        )
    interpret = jax.default_backend() == "cpu"
    K = oo.gather_k
    depths, vals, alpha = rasterize_capsules_mlab(
        csr, params, w2, h2, s2.tile_w, s2.tile_h, K,
        settings.tf_color, settings.tf_opacity,
        store_mode="gather", interpret=interpret,
    )
    g = vals[0]  # [K, n_tiles, P] importance
    sid = vals[1]  # [K, n_tiles, P] segment ids (float)
    valid = depths < 1.5

    # Algorithm 1, unrolled over the K front-to-back nodes.
    g2 = jnp.where(valid, g * g, 0.0)
    g_all = jnp.sum(g2, axis=0)
    g_f = jnp.zeros_like(g_all)
    p_const = 1.0
    alphas = []
    for i in range(K):
        g_b = jnp.maximum(g_all - g2[i] - g_f, 0.0)
        a_i = p_const / (
            p_const
            + jnp.power(jnp.clip(1.0 - g[i], 0.0, 1.0), 2.0 * oo.lambda_)
            * (oo.r * g_f + oo.q * g_b)
        )
        alphas.append(jnp.where(valid[i], a_i, 1.0))
        g_f = g_f + g2[i]
    alpha_nodes = jnp.stack(alphas, axis=0)

    # Per-segment minimum (deterministic scatter-min) + visibility.
    S = scene.num_segments
    ids_flat = jnp.where(valid, sid, 0.0).astype(jnp.int32).reshape(-1)
    a_flat = alpha_nodes.reshape(-1)
    v_flat = valid.reshape(-1)
    seg_opacity = jnp.ones((S,), jnp.float32).at[ids_flat].min(
        jnp.where(v_flat, a_flat, 1.0), mode="drop"
    )
    seg_visible = jnp.zeros((S,), jnp.float32).at[ids_flat].max(
        jnp.where(v_flat, 1.0, 0.0), mode="drop"
    )
    if band_axis is not None:
        # Cross-chip per-segment reduction: min opacity / any-visible.
        seg_opacity = jax.lax.pmin(seg_opacity, band_axis)
        seg_visible = jax.lax.pmax(seg_visible, band_axis)

    # Laplacian smoothing along each line's segment chain.
    L, Pm1 = num_lines, pts_per_line - 1
    op = seg_opacity.reshape(L, Pm1)
    vis = seg_visible.reshape(L, Pm1)

    def smooth_iter(x, _):
        left = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        right = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
        vleft = jnp.concatenate([vis[:, :1], vis[:, :-1]], axis=1)
        vright = jnp.concatenate([vis[:, 1:], vis[:, -1:]], axis=1)
        left = jnp.where(vleft > 0, left, x)
        right = jnp.where(vright > 0, right, x)
        out = x + oo.relaxation * (-x + 0.5 * left + 0.5 * right)
        return out, None

    op, _ = jax.lax.scan(smooth_iter, op, None, length=oo.s)

    # Per-vertex opacity: average of adjacent segments (parametrization
    # midpoint), then temporal smoothing against the previous frame.
    first = op[:, :1]
    last = op[:, -1:]
    mid = 0.5 * (op[:, :-1] + op[:, 1:])
    vert = jnp.concatenate([first, mid, last], axis=1)  # [L, P]
    vfirst = vis[:, :1]
    vlast = vis[:, -1:]
    vmid = jnp.maximum(vis[:, :-1], vis[:, 1:])
    vvert = jnp.concatenate([vfirst, vmid, vlast], axis=1)
    vert = jnp.where(vvert > 0, vert, prev_vertex_opacity)
    t = oo.temporal_smoothing
    vert = (1.0 - t) * prev_vertex_opacity + t * vert
    return vert  # [L, P]


@partial(jax.jit, static_argnames=("settings", "K"))
def _final_render(
    scene, view_proj, camera_position, proj_ab, vertex_opacity,
    settings: RasterSettings, K: int,
):
    """Step 6: full-res transparent render with per-segment alpha rows.

    Delegates to `render_tubes_mlab` (opacity 1.0 — the solved vertex
    opacities ARE the alphas), which runs the kernel in composite mode:
    the K nodes are shaded and front-to-back blended IN-KERNEL instead of
    writing 5*K per-node planes (~330 MB of HBM traffic at 1080p, K=8)
    for an XLA resolve."""
    from linevis_tpu.render.oit import render_tubes_mlab

    a0 = vertex_opacity[:, :-1].reshape(-1)
    a1 = vertex_opacity[:, 1:].reshape(-1)
    seg_alpha = jnp.stack([a0, a1 - a0], axis=0)
    return render_tubes_mlab(
        scene, view_proj, camera_position, proj_ab, settings, K=K,
        opacity=1.0, seg_alpha=seg_alpha,
    )


class OpacityOptimizationRenderer:
    """Stateful frame renderer (temporal smoothing across frames).

    Mirrors the reference renderer's lifecycle: construct per scene, call
    `render(view_proj, camera_position)` per frame.
    """

    # Extra opacity-solve frames after a camera move, so the temporal EMA
    # (temporal_smoothing=0.15) converges to steady state
    # (OpacityOptimizationRenderer.hpp:125-127: NUM_SMOOTHING_FRAMES=40).
    NUM_SMOOTHING_FRAMES = 40

    def __init__(
        self,
        scene: CapsuleScene,
        num_lines: int,
        pts_per_line: int,
        settings: RasterSettings,
        oo: OpacityOptimizationSettings = OpacityOptimizationSettings(),
    ):
        self.scene = scene
        self.num_lines = num_lines
        self.pts_per_line = pts_per_line
        self.settings = settings
        self.oo = oo
        self.vertex_opacity = jnp.ones((num_lines, pts_per_line), jnp.float32)
        self._last_vp: Optional[np.ndarray] = None
        self.smoothing_frames_remaining = self.NUM_SMOOTHING_FRAMES

    def render(self, camera: Camera) -> jnp.ndarray:
        vp_np = np.asarray(camera.view_projection_matrix())
        if self._last_vp is None or not np.array_equal(self._last_vp, vp_np):
            # onHasMoved: restart the post-move smoothing schedule.
            self.smoothing_frames_remaining = self.NUM_SMOOTHING_FRAMES
            self._last_vp = vp_np
        vp = jnp.asarray(vp_np)
        cp = jnp.asarray(np.asarray(camera.position, np.float32))
        ab = jnp.asarray(_proj_constants(camera))
        if self.smoothing_frames_remaining > 0:
            self.vertex_opacity = _opacity_solve(
                self.scene, vp, cp, ab, self.vertex_opacity,
                self.settings, self.oo, self.num_lines, self.pts_per_line,
            )
            self.smoothing_frames_remaining -= 1
        return _final_render(
            self.scene, vp, cp, ab, self.vertex_opacity,
            self.settings, self.oo.render_k,
        )

    def settle(self, camera: Camera) -> jnp.ndarray:
        """Run the full post-move smoothing schedule, return the final
        frame (the reference's converged steady state)."""
        img = self.render(camera)
        while self.smoothing_frames_remaining > 0:
            img = self.render(camera)
        return img


def render_opacity_optimization(
    scene: CapsuleScene,
    num_lines: int,
    pts_per_line: int,
    camera: Camera,
    settings: Optional[RasterSettings] = None,
    oo: OpacityOptimizationSettings = OpacityOptimizationSettings(),
    warmup_frames: int = 4,
) -> np.ndarray:
    """Convenience: run a few frames to settle temporal smoothing -> image."""
    settings = settings or RasterSettings(width=camera.width, height=camera.height)
    r = OpacityOptimizationRenderer(scene, num_lines, pts_per_line, settings, oo)
    img = None
    for _ in range(warmup_frames):
        img = r.render(camera)
    return np.moveaxis(np.asarray(img), 0, -1)
