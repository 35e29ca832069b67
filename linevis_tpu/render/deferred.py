"""Deferred (visibility-buffer) opaque rendering + temporal upscaler.

Port of the reference's deferred renderer
(`src/Renderers/Deferred/DeferredRenderer.{hpp:83,cpp}`): a two-phase
visibility-buffer pipeline — phase 1 rasterizes primitive IDs + depth,
phase 2 shades only the visible fragment of each pixel — plus the
deferred-resolve extras: per-pixel **motion vectors** from the previous
frame's camera (`DeferredRenderer.hpp:70-80`) and a temporal **upscaler**
slot (the reference wires vendor DLSS/XeSS SDKs, `src/Renderers/
Upscaler/*`; this framework ships a vendor-free temporal reprojection
upscaler with the same interface role: jittered low-res input + motion
vectors -> accumulated full-res output).

TPU-native mapping: the capsule raster kernel
(`kernels/raster_capsule.py`) already IS the visibility phase — it emits
a G-buffer (depth, segment id, attribute, normal, tangent) and never
shades in-kernel; `shade_capsules` is the deferred resolve, pure
elementwise XLA over the image.  The reference's meshlet culling / BVH
draw-indirect geometry feeding (`Deferred/Tree/*`) exists to keep a GPU
rasterizer fed; its TPU equivalent is the tile-binning CSR build
(`kernels/binning.py` + Liang-Barsky capsule-vs-tile culling), which
performs the same job: only primitives overlapping a tile are ever
touched by that tile's program.  An LBVH over segments is available in
`linevis_tpu/ops/lbvh.py` for ray-query-style consumers.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.kernels.raster_capsule import rasterize_capsules_pallas
from linevis_tpu.kernels.tiles import unpack_tiles
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.renderer import LineRenderer
from linevis_tpu.render.tube_raster import (
    _proj_constants,
    prepare_capsule_frame,
    shade_capsules,
)

__all__ = [
    "render_tubes_deferred",
    "motion_vectors",
    "TemporalUpscaler",
    "DeferredOpaqueRenderer",
]


def _reconstruct_positions(zndc, camera_position, ray_basis, proj_ab):
    """World position per pixel from the visibility buffer's NDC depth."""
    H, W = zndc.shape
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :] * (2.0 / W) - 1.0
    v = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None] * (2.0 / H)
    d = (
        ray_basis[:, 0][:, None, None] * jnp.broadcast_to(u, (H, W))[None]
        + ray_basis[:, 1][:, None, None] * jnp.broadcast_to(v, (H, W))[None]
        + ray_basis[:, 2][:, None, None]
    )
    view_z = proj_ab[1] / jnp.maximum(proj_ab[0] - zndc, 1e-9)
    return camera_position[:, None, None] + d * view_z[None]


def motion_vectors(pos, fg, prev_view_proj):
    """Per-pixel screen motion (pixels, +x right / +y down) of the visible
    surface between the previous camera and the current one — the
    deferred resolve's motion-vector target (DeferredRenderer.hpp:70-80;
    static geometry, so motion is purely camera-induced).

    pos: [3, H, W] world positions; fg: [H, W] foreground mask.
    Returns [2, H, W]; background pixels get zero motion.
    """
    _, H, W = pos.shape
    clip = (
        prev_view_proj[:3, :3] @ pos.reshape(3, -1)
        + prev_view_proj[:3, 3:4]
    )
    w = (
        prev_view_proj[3, :3] @ pos.reshape(3, -1) + prev_view_proj[3, 3]
    )
    ndc = clip[:2] / jnp.maximum(jnp.abs(w), 1e-9)[None]
    prev_px = jnp.stack(
        [
            (ndc[0] * 0.5 + 0.5) * W,
            (0.5 - ndc[1] * 0.5) * H,
        ],
        axis=0,
    ).reshape(2, H, W)
    cur_px = jnp.stack(
        jnp.meshgrid(
            jnp.arange(W, dtype=jnp.float32) + 0.5,
            jnp.arange(H, dtype=jnp.float32) + 0.5,
        ),
        axis=0,
    )
    mv = cur_px - prev_px
    return jnp.where(fg[None], mv, 0.0)


@partial(jax.jit, static_argnames=("settings", "with_motion"))
def render_tubes_deferred(
    scene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    prev_view_proj: jnp.ndarray = None,
    with_motion: bool = False,
):
    """Visibility-buffer render -> [4, H, W] RGBA (+ [2, H, W] motion).

    Identical image to `render_tubes` (same kernel, same resolve) — the
    deferred mode adds the auxiliary targets the reference's deferred
    pipeline provides to upscalers and TAA.
    """
    csr, params, basis = prepare_capsule_frame(
        scene, view_proj, camera_position, proj_ab, settings,
        aa_margin=0.5 if settings.aa else 0.0,
    )
    interpret = jax.default_backend() == "cpu"
    depth_t, id_t, gbuf_t = rasterize_capsules_pallas(
        csr, params, settings.width, settings.height,
        settings.tile_w, settings.tile_h, interpret=interpret,
        use_aa=settings.aa,
    )

    def unp(x):
        return unpack_tiles(
            x, csr.tiles_x, csr.tiles_y, settings.tile_w, settings.tile_h,
            settings.width, settings.height,
        )

    zndc = unp(depth_t)
    seg_id = unp(id_t)
    attr, nx, ny, nz, tx, ty, tz, cov = (unp(b) for b in gbuf_t)

    w_all = view_proj[3, :3] @ scene.a + view_proj[3, 3]
    big = jnp.float32(3e38)
    dmin = jnp.min(jnp.where(scene.mask, w_all, big))
    dmax = jnp.max(jnp.where(scene.mask, w_all, -big))

    img = shade_capsules(
        zndc, seg_id, attr,
        jnp.stack([nx, ny, nz], axis=0), jnp.stack([tx, ty, tz], axis=0),
        camera_position, basis, proj_ab, dmin, dmax, settings,
        coverage=cov,
    )
    if not with_motion:
        return img
    pos = _reconstruct_positions(zndc, camera_position, basis, proj_ab)
    mv = motion_vectors(pos, seg_id >= 0, prev_view_proj)
    return img, mv


@partial(jax.jit, static_argnames=("scale",))
def _taa_step(history, low, motion_low, scale: int, blend):
    """One temporal-upscale step: bilinear history reprojection + 3x3
    neighborhood color clamp (standard TAA rectification) + exponential
    blend of the upsampled current frame."""
    C, h, w = low.shape
    H, W = h * scale, w * scale

    # Upsample current frame + motion to target resolution.
    up = jax.image.resize(low, (C, H, W), method="bilinear")
    mv = jax.image.resize(motion_low * scale, (2, H, W), method="bilinear")

    # Reproject history: sample at (cur - motion).
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] - mv[1]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] - mv[0]
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
    fy = ys - y0
    fx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)

    def samp(yi, xi):
        return history[:, yi, xi]

    hist = (
        samp(y0i, x0i) * ((1 - fy) * (1 - fx))[None]
        + samp(y0i, x1i) * ((1 - fy) * fx)[None]
        + samp(y1i, x0i) * (fy * (1 - fx))[None]
        + samp(y1i, x1i) * (fy * fx)[None]
    )

    # Neighborhood clamp against the current frame (ghosting control).
    lo = up
    hi = up
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ny = jnp.clip(jnp.arange(H) + dy * scale, 0, H - 1)
            nx = jnp.clip(jnp.arange(W) + dx * scale, 0, W - 1)
            v = up[:, ny, :][:, :, nx]
            lo = jnp.minimum(lo, v)
            hi = jnp.maximum(hi, v)
    hist = jnp.clip(hist, lo, hi)
    return hist * (1.0 - blend) + up * blend


class TemporalUpscaler:
    """Vendor-free temporal upscaler filling the reference's DLSS/XeSS
    slot (`src/Renderers/Upscaler/Upscaler.hpp:56-60`): consumes the
    deferred pipeline's low-res color + motion vectors and maintains a
    full-resolution accumulation history."""

    def __init__(self, scale: int = 2, blend: float = 0.125):
        self.scale = int(scale)
        self.blend = float(blend)
        self._history = None

    def reset(self):
        self._history = None

    def step(self, low_img: jnp.ndarray, motion_low: jnp.ndarray):
        """low_img [C, h, w], motion_low [2, h, w] -> [C, h*s, w*s]."""
        C, h, w = low_img.shape
        if self._history is None:
            self._history = jax.image.resize(
                low_img, (C, h * self.scale, w * self.scale),
                method="bilinear",
            )
            return self._history
        self._history = _taa_step(
            self._history, low_img, motion_low, self.scale,
            jnp.float32(self.blend),
        )
        return self._history


class DeferredOpaqueRenderer(LineRenderer):
    """Reference RENDERING_MODE_DEFERRED_SHADING (`DeferredRenderer.hpp:83`).

    Produces the same image as Opaque (the TPU pipeline is always
    visibility-buffer deferred) and additionally maintains the previous
    frame's camera to emit motion vectors; with `upscaling_factor` > 1 it
    renders at reduced resolution and temporally upscales.
    """

    name = "Deferred Opaque"

    def __init__(self, settings=None):
        super().__init__(settings)
        self.prev_vp = None
        self.upscaling_factor = 1
        self.upscaler = None
        self.last_motion = None

    def set_new_settings(self, settings) -> None:
        super().set_new_settings(settings)
        if settings.has_key("upscaling_factor"):
            self.upscaling_factor = settings.get_int("upscaling_factor")
            self.upscaler = None

    def render(self, camera: Camera) -> np.ndarray:
        scene = self.line_data.get_capsule_scene()
        f = self.upscaling_factor
        cam = camera
        if f > 1:
            cam = dataclasses.replace(
                camera, width=camera.width // f, height=camera.height // f
            )
        s = self._raster_settings(cam)
        vp = jnp.asarray(cam.view_projection_matrix())
        prev = self.prev_vp if self.prev_vp is not None else vp
        img, mv = render_tubes_deferred(
            scene, vp,
            jnp.asarray(np.asarray(cam.position, np.float32)),
            jnp.asarray(_proj_constants(cam)),
            s, prev_view_proj=prev, with_motion=True,
        )
        self.prev_vp = vp
        self.last_motion = mv
        if f > 1:
            if self.upscaler is None:
                self.upscaler = TemporalUpscaler(scale=f)
            img = self.upscaler.step(img, mv)
        return np.moveaxis(np.asarray(img), 0, -1)
