"""Renderer base class + rendering-mode registry.

Reference: abstract `LineRenderer` (`src/Renderers/LineRenderer.hpp:66`) —
setLineData / render / setNewSettings lifecycle — and the mode enum
`RenderingModes.hpp:32-52` with the factory switch in
`MainApp::setRenderer` (`MainApp.cpp:732-862`). Unsupported modes fall
back to the opaque renderer with a warning (`MainApp.cpp:864-874`).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Dict, Optional, Type

import numpy as np

from linevis_tpu.core.settings import SettingsMap
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.transfer_function import TransferFunction
from linevis_tpu.scene.line_data import LineData

__all__ = [
    "LineRenderer",
    "RENDERING_MODE_ALL",
    "create_renderer",
    "register_renderer",
]


class LineRenderer:
    """Base renderer: owns settings, caches per-scene state."""

    name = "Base"

    def __init__(self, settings: Optional[SettingsMap] = None):
        self.line_data: Optional[LineData] = None
        self.transfer_function = TransferFunction.standard()
        self.transfer_function_range = None  # (vmin, vmax) in attr space
        self.depth_cue_strength = 0.0
        self.opacity = 0.3
        self.settings = SettingsMap()
        if settings:
            self.set_new_settings(settings)

    # -- lifecycle (LineRenderer.hpp) ---------------------------------------
    def set_line_data(self, line_data: LineData) -> None:
        self.line_data = line_data

    def set_transfer_function(self, tf: TransferFunction) -> None:
        self.transfer_function = tf

    def set_new_settings(self, settings: SettingsMap) -> None:
        self.settings.update(settings)
        if settings.has_key("depth_cue_strength"):
            self.depth_cue_strength = settings.get_float("depth_cue_strength")
        if settings.has_key("opacity"):
            self.opacity = settings.get_float("opacity")

    # Tile shape: opaque z-test kernels are fastest at 32x16; the OIT
    # K-extraction kernels win at 16x8 (fewer wasted lanes per thin tube;
    # measured on TPU v5e, see bench.py / STATUS.md).
    TILE_W, TILE_H = 32, 16

    def _raster_settings(self, camera: Camera) -> RasterSettings:
        c_pts, o_pts = self.transfer_function.as_static_points()
        if self.transfer_function_range is not None:
            # Remap TF control points into [vmin, vmax] of the normalized
            # attribute (reference set_transfer_functions_range,
            # ReplayWidget.cpp:576-624 -> TransferFunctionWindow range).
            vmin, vmax = self.transfer_function_range
            span = vmax - vmin

            def remap(pts):
                inner = tuple(
                    (vmin + p[0] * span,) + tuple(p[1:]) for p in pts
                )
                # Clamp outside [vmin, vmax] to the edge values.
                return (
                    ((0.0,) + tuple(pts[0][1:]),)
                    + inner
                    + ((1.0,) + tuple(pts[-1][1:]),)
                )

            c_pts, o_pts = remap(c_pts), remap(o_pts)
        return RasterSettings(
            width=camera.width,
            height=camera.height,
            tile_w=self.TILE_W,
            tile_h=self.TILE_H,
            depth_cue_strength=self.depth_cue_strength,
            tf_color=c_pts,
            tf_opacity=o_pts,
        )

    def render(self, camera: Camera) -> np.ndarray:
        """Render a frame -> [H, W, 4] linear RGBA numpy array."""
        raise NotImplementedError


class OpaqueLineRenderer(LineRenderer):
    """Reference RENDERING_MODE_OPAQUE (`OpaqueLineRenderer.hpp:40`).

    `tubeGeometry` setting selects the raster geometry:
    - 'capsule' (default): analytic linear-swept spheres — the
      reference's own ray-tracing geometry (`VulkanRayTracer.hpp:53-63`)
      promoted to the raster path; exact round cross-section, analytic
      coverage AA, fastest.
    - 'prism' (flagship parity geometry): the reference's raster
      default, the `tubeNumSubdivisions`-gon triangle tube
      (`src/Renderers/Tubes/Tubes.hpp:40`,
      `src/LineData/LineData.hpp:374-386`, default 8), rendered
      analytically by the prism kernel (`kernels/raster_prism.py`) at
      capsule-kernel speed — identical ring vertices/frames/silhouette
      to the triangle mesh (planarized side quads, sub-pixel bound).
    - 'triangle': the same geometry through the exact triangle
      G-buffer pipeline (`render/opaque.py`) — the slow oracle.
    """

    name = "Opaque"

    def set_new_settings(self, settings: SettingsMap) -> None:
        super().set_new_settings(settings)
        if settings.has_key("tubeGeometry"):
            v = settings.get_value("tubeGeometry")
            if v not in ("capsule", "prism", "triangle"):
                raise ValueError(f"tubeGeometry {v!r}")

    @property
    def tube_geometry(self) -> str:
        return self.settings.get_value("tubeGeometry", "capsule")

    def render(self, camera: Camera) -> np.ndarray:
        if self.tube_geometry == "prism":
            from linevis_tpu.render.tube_raster import (
                render_tubes_prism_image,
            )

            subdiv = int(self.settings.get_float("tubeNumSubdivisions", 8))
            scene = self.line_data.get_prism_scene(num_subdivisions=subdiv)
            return render_tubes_prism_image(
                scene, camera, tf=self.transfer_function,
                settings=self._raster_settings(camera),
                supersample=2,  # MSAA role (binary-coverage raster)
            )
        if self.tube_geometry == "triangle":
            from linevis_tpu.render.opaque import render_opaque_image

            subdiv = int(self.settings.get_float("tubeNumSubdivisions", 8))
            mesh = self.line_data.get_tube_mesh(num_subdivisions=subdiv)
            s = self._raster_settings(camera)
            s = dataclasses.replace(s, tile_w=32, tile_h=16)
            return render_opaque_image(
                mesh, camera, tf=self.transfer_function, settings=s,
                supersample=2,  # SSAA plays the reference's MSAA role here
            )
        from linevis_tpu.render.tube_raster import render_tubes_image

        scene = self.line_data.get_capsule_scene()
        return render_tubes_image(
            scene, camera, settings=self._raster_settings(camera)
        )


class _MlabBase(LineRenderer):
    K = 8
    TILE_W, TILE_H = 16, 8  # OIT kernels win at small tiles (see base)

    def render(self, camera: Camera) -> np.ndarray:
        from linevis_tpu.render.oit import render_tubes_mlab_image

        scene = self.line_data.get_capsule_scene()
        return render_tubes_mlab_image(
            scene, camera, settings=self._raster_settings(camera),
            K=self.K, opacity=self.opacity,
        )


class MLABRenderer(_MlabBase):
    """Reference RENDERING_MODE_MLAB (8 nodes default)."""

    name = "Multi-Layer Alpha Blending"
    K = 8


class PerPixelLinkedListRenderer(_MlabBase):
    """Reference RENDERING_MODE_PER_PIXEL_LINKED_LIST. Realized as an
    exact K-nearest sorted blend with K=32 (bounded-memory redesign of the
    unbounded linked list; equal results for depth complexity <= K, and
    SSIM 0.993 vs the exact ray-traced oracle at the reference's
    "very large" depth complexity — docs/BOUNDED_K_FIDELITY.md)."""

    name = "Per-Pixel Linked Lists"
    K = 32


class WBOITRenderer(LineRenderer):
    """Reference RENDERING_MODE_WBOIT (WBOITRenderer.cpp:195)."""

    name = "Weighted Blended Order Independent Transparency"
    TILE_W, TILE_H = 16, 8

    def render(self, camera: Camera) -> np.ndarray:
        import jax.numpy as jnp
        from linevis_tpu.render.oit import render_tubes_wboit
        from linevis_tpu.render.tube_raster import _proj_constants

        scene = self.line_data.get_capsule_scene()
        img = render_tubes_wboit(
            scene,
            jnp.asarray(camera.view_projection_matrix()),
            jnp.asarray(np.asarray(camera.position, np.float32)),
            jnp.asarray(_proj_constants(camera)),
            self._raster_settings(camera),
            opacity=self.opacity,
        )
        return np.moveaxis(np.asarray(img), 0, -1)


class _OitImageBase(LineRenderer):
    """Shared plumbing for OIT renderers taking (vp, cp, proj_ab)."""

    TILE_W, TILE_H = 16, 8

    def _render_with(self, camera: Camera, fn, **kw) -> np.ndarray:
        import jax.numpy as jnp
        from linevis_tpu.render.tube_raster import _proj_constants

        scene = self.line_data.get_capsule_scene()
        img = fn(
            scene,
            jnp.asarray(camera.view_projection_matrix()),
            jnp.asarray(np.asarray(camera.position, np.float32)),
            jnp.asarray(_proj_constants(camera)),
            self._raster_settings(camera),
            opacity=self.opacity,
            **kw,
        )
        return np.moveaxis(np.asarray(img), 0, -1)


class AtomicLoop64Renderer(_OitImageBase):
    """Reference RENDERING_MODE_ATOMIC_LOOP_64 (AtomicLoop64Renderer.cpp:283):
    exact K-nearest fragments (the 64-bit atomicMin loop's steady state),
    no overflow merge."""

    name = "Atomic Loop 64-Bit"
    K = 16

    def render(self, camera: Camera) -> np.ndarray:
        from linevis_tpu.render.oit import render_tubes_atomic_loop

        return self._render_with(camera, render_tubes_atomic_loop, K=self.K)


class DepthPeelingRenderer(_OitImageBase):
    """Reference RENDERING_MODE_DEPTH_PEELING (DepthPeelingRenderer.cpp:423):
    exact front-to-back peeling, K layers per pass x 4 passes."""

    name = "Depth Peeling"

    def render(self, camera: Camera) -> np.ndarray:
        from linevis_tpu.render.oit import render_tubes_depth_peeling

        return self._render_with(camera, render_tubes_depth_peeling)


class MLABBucketRenderer(_OitImageBase):
    """Reference RENDERING_MODE_MLAB_BUCKETS (MLABBucketRenderer.*): exact
    near bucket + MLAB-merged far bucket."""

    name = "MLAB (Buckets)"

    def render(self, camera: Camera) -> np.ndarray:
        from linevis_tpu.render.oit import render_tubes_mlab_buckets

        return self._render_with(camera, render_tubes_mlab_buckets)


class MBOITRenderer(LineRenderer):
    """Reference RENDERING_MODE_MBOIT (MBOITRenderer.cpp:688): moment
    transmittance reconstruction, 4 moments / float32 / power defaults.
    `usePowerMoments = false` (MBOITRenderer.hpp:144) switches to
    trigonometric moments (TrigonometricMomentMath.glsl)."""

    name = "Moment-Based OIT"
    n_mom = 4
    use_power_moments = True
    pixel_format = "float32"
    TILE_W, TILE_H = 16, 8

    def set_new_settings(self, settings: SettingsMap) -> None:
        super().set_new_settings(settings)
        if settings.has_key("numMoments"):
            self.n_mom = settings.get_int("numMoments")
        if settings.has_key("usePowerMoments"):
            self.use_power_moments = settings.get_bool("usePowerMoments")
        if settings.has_key("pixelFormat"):
            # Reference values: "Float" -> FLOAT_32, else UNORM_16
            # (MBOITRenderer.cpp:286).
            fmt = str(settings.get_value("pixelFormat"))
            self.pixel_format = ("float32" if fmt.lower().startswith("float")
                                 else "unorm16")

    def render(self, camera: Camera) -> np.ndarray:
        import jax.numpy as jnp
        from linevis_tpu.render.oit import render_tubes_mboit
        from linevis_tpu.render.tube_raster import _proj_constants

        scene = self.line_data.get_capsule_scene()
        img = render_tubes_mboit(
            scene,
            jnp.asarray(camera.view_projection_matrix()),
            jnp.asarray(np.asarray(camera.position, np.float32)),
            jnp.asarray(_proj_constants(camera)),
            self._raster_settings(camera),
            n_mom=self.n_mom,
            opacity=self.opacity,
            trigonometric=not self.use_power_moments,
            pixel_format=self.pixel_format,
        )
        return np.moveaxis(np.asarray(img), 0, -1)


class DepthComplexityRenderer(LineRenderer):
    """Reference RENDERING_MODE_DEPTH_COMPLEXITY: fragment counts mapped to
    a color ramp (DepthComplexityRenderer.cpp:346)."""

    name = "Depth Complexity"

    def render(self, camera: Camera) -> np.ndarray:
        import jax.numpy as jnp
        from linevis_tpu.render.oit import render_depth_complexity
        from linevis_tpu.render.tube_raster import _proj_constants

        scene = self.line_data.get_capsule_scene()
        counts = np.asarray(
            render_depth_complexity(
                scene,
                jnp.asarray(camera.view_projection_matrix()),
                jnp.asarray(np.asarray(camera.position, np.float32)),
                jnp.asarray(_proj_constants(camera)),
                self._raster_settings(camera),
            )
        )
        mx = max(counts.max(), 1.0)
        t = counts / mx
        rgba = self.transfer_function.lookup(t)
        img = np.array(rgba)  # writable copy (lookup may return read-only)
        img[..., 3] = 1.0
        img[counts == 0] = self._raster_settings(camera).background_color
        return img


def _halton(index: int, base: int) -> float:
    """Low-discrepancy sequence for the jittered sampling offsets
    (reference VulkanRayTracer.hpp:135-143 jittered accumulation)."""
    f, r = 1.0, 0.0
    while index > 0:
        f /= base
        r += f * (index % base)
        index //= base
    return r


class VulkanRayTracerRenderer(LineRenderer):
    """Reference RENDERING_MODE_VULKAN_RAY_TRACER (VulkanRayTracer.*):
    analytic capsules (the LSS geometry mode) over the Karras LBVH with
    the iterative re-cast transparency loop (TubeRayTracing.glsl:61-82)
    or, with settings key `use_mlat`, the MLAT K-node payload
    (MlatInsert.glsl, `num_nodes` nodes).  Per-frame jittered subpixel
    sampling accumulated over <=32 frames; the accumulator resets on
    camera or scene changes, like the reference."""

    name = "Vulkan Ray Tracer"
    MAX_ACCUM_FRAMES = 32

    def __init__(self, settings=None):
        super().__init__(settings)
        self._accum = None
        self._frame = 0
        self._last_vp = None
        self._bvh = None

    def set_line_data(self, line_data: LineData) -> None:
        super().set_line_data(line_data)
        self._accum = None
        self._frame = 0
        self._bvh = None

    def render(self, camera: Camera) -> np.ndarray:
        import jax.numpy as jnp

        from linevis_tpu.render.ray_tracer import (
            build_capsule_bvh,
            render_tubes_mlat,
            render_tubes_raytraced,
        )
        from linevis_tpu.render.tube_raster import _proj_constants

        scene = self.line_data.get_capsule_scene()
        vp_np = np.asarray(camera.view_projection_matrix())
        if self._last_vp is None or not np.array_equal(self._last_vp, vp_np):
            self._accum = None
            self._frame = 0
            self._last_vp = vp_np
        if self._bvh is None:
            # Builder quality option (reference bvhBuildAlgorithm,
            # DeferredModes.hpp:79-92): "linear" | "binned_sah" |
            # "sweep_sah" | "ploc" (the reference's 4-builder set).
            self._bvh = build_capsule_bvh(
                scene,
                builder=str(
                    self.settings.get_value("bvhBuildAlgorithm", "linear")
                ),
            )
        # Frame 0 is unjittered (deterministic-sampling parity); later
        # frames take Halton(2,3) subpixel offsets.
        if self._frame == 0:
            jit = jnp.zeros((2,), jnp.float32)
        else:
            jit = jnp.asarray(
                [_halton(self._frame, 2) - 0.5, _halton(self._frame, 3) - 0.5],
                jnp.float32,
            )
        common = dict(
            view_proj=jnp.asarray(vp_np),
            camera_position=jnp.asarray(
                np.asarray(camera.position, np.float32)
            ),
            proj_ab=jnp.asarray(_proj_constants(camera)),
            settings=self._raster_settings(camera),
            opacity=self.opacity,
            bvh=self._bvh,
            jitter=jit,
        )
        if self.settings.get_bool("use_mlat", False):
            img = np.asarray(render_tubes_mlat(
                scene, K=self.settings.get_int("num_nodes", 8), **common
            ))
        else:
            img = np.asarray(render_tubes_raytraced(
                scene,
                max_depth_complexity=self.settings.get_int(
                    "max_depth_complexity", 32
                ),
                **common,
            ))
        if self._accum is None:
            self._accum = img
        else:
            n = min(self._frame, self.MAX_ACCUM_FRAMES - 1)
            self._accum = (self._accum * n + img) / (n + 1)
        self._frame += 1
        return np.moveaxis(self._accum, 0, -1)


class RtaoRenderer(LineRenderer):
    """Ray-traced ambient occlusion shading mode: analytic capsule hits
    (the reference's LSS geometry mode) shaded with screen-space RTAO and
    per-frame sample accumulation (<=32 frames, 2 spp —
    VulkanRayTracedAmbientOcclusion.cpp:743). Stateful like the
    reference: the accumulator resets on camera or scene changes.

    Settings key `denoiser` = "SVGF (Temporal)" switches the static-camera
    accumulator to full temporal SVGF (history reprojection with motion
    vectors + variance-guided filtering, SVGF.hpp:46,92) — noise keeps
    converging under a MOVING camera."""

    name = "RTAO"
    MAX_ACCUM_FRAMES = 32

    def __init__(self, settings=None):
        super().__init__(settings)
        self._accum = None
        self._frame = 0
        self._last_vp = None
        self._grid = None
        self._svgf_state = None
        self._prev_vp = None

    def set_line_data(self, line_data: LineData) -> None:
        super().set_line_data(line_data)
        self._accum = None
        self._frame = 0
        self._grid = None
        self._svgf_state = None
        self._prev_vp = None

    def render(self, camera: Camera) -> np.ndarray:
        import jax.numpy as jnp

        from linevis_tpu.kernels.ao_grid import build_segment_grid
        from linevis_tpu.render.rtao import (
            RtaoSettings,
            render_tubes_rtao,
        )
        from linevis_tpu.render.tube_raster import _proj_constants

        scene = self.line_data.get_capsule_scene()
        vp_np = np.asarray(camera.view_projection_matrix())
        use_temporal = (
            self.settings.get_value("denoiser", "") == "SVGF (Temporal)"
        )
        if self._last_vp is None or not np.array_equal(self._last_vp, vp_np):
            self._accum = None
            if not use_temporal:
                self._frame = 0  # temporal SVGF survives camera motion
            self._last_vp = vp_np
        rtao = RtaoSettings()
        if self._grid is None:
            self._grid = build_segment_grid(
                scene.a, scene.ba, scene.radius, scene.mask,
                resolution=rtao.grid_resolution,
            )
        common = (
            scene,
            jnp.asarray(vp_np),
            jnp.asarray(np.asarray(camera.position, np.float32)),
            jnp.asarray(_proj_constants(camera)),
            self._raster_settings(camera),
        )
        if use_temporal:
            from linevis_tpu.render.deferred import motion_vectors
            from linevis_tpu.render.denoiser import svgf_temporal_denoise

            img, (pos, normal, fg) = render_tubes_rtao(
                *common, rtao, frame=self._frame, grid=self._grid,
                return_features=True,
            )
            if self._prev_vp is None:
                motion = jnp.zeros((2,) + fg.shape, jnp.float32)
            else:
                motion = motion_vectors(pos, fg, jnp.asarray(self._prev_vp))
            out, self._svgf_state = svgf_temporal_denoise(
                img[:3], motion, pos, self._svgf_state, normal=normal,
            )
            self._prev_vp = vp_np
            self._frame += 1
            res = np.asarray(jnp.concatenate([out, img[3:4]], axis=0))
            return np.moveaxis(res, 0, -1)

        img = np.asarray(render_tubes_rtao(
            *common, rtao, frame=self._frame, grid=self._grid,
        ))
        if self._accum is None:
            self._accum = img
        else:
            n = min(self._frame, self.MAX_ACCUM_FRAMES - 1)
            self._accum = (self._accum * n + img) / (n + 1)
        self._frame += 1
        return np.moveaxis(self._accum, 0, -1)


class OpacityOptimizationRendererMode(LineRenderer):
    """Reference RENDERING_MODE_OPACITY_OPTIMIZATION."""

    name = "Opacity Optimization"

    def __init__(self, settings=None):
        super().__init__(settings)
        self._impl = None

    def set_line_data(self, line_data: LineData) -> None:
        super().set_line_data(line_data)
        self._impl = None

    def render(self, camera: Camera) -> np.ndarray:
        from linevis_tpu.render.opacity_optimization import (
            OpacityOptimizationRenderer as Impl,
        )

        if self._impl is None:
            traj = self.line_data.trajectories
            self._impl = Impl(
                self.line_data.get_capsule_scene(),
                traj.num_lines,
                traj.max_points,
                self._raster_settings(camera),
            )
        img = self._impl.render(camera)
        return np.moveaxis(np.asarray(img), 0, -1)


_REGISTRY: Dict[str, Type[LineRenderer]] = {}
# Modes whose module imports this one (e.g. subclasses living in other
# files): resolved on first create_renderer call to avoid import cycles.
_LAZY_REGISTRY: Dict[str, tuple] = {
    "Deferred Opaque": ("linevis_tpu.render.deferred",
                        "DeferredOpaqueRenderer"),
}


def register_renderer(mode_name: str, cls: Type[LineRenderer]) -> None:
    _REGISTRY[mode_name] = cls


# Mode names follow RenderingModes.hpp:32-52.
register_renderer("Opaque", OpaqueLineRenderer)
register_renderer("Per-Pixel Linked Lists", PerPixelLinkedListRenderer)
register_renderer("Multi-Layer Alpha Blending", MLABRenderer)
register_renderer(
    "Weighted Blended Order Independent Transparency", WBOITRenderer
)
register_renderer("WBOIT", WBOITRenderer)  # RENDERING_MODE_NAMES[8]
register_renderer("Moment-Based OIT", MBOITRenderer)
register_renderer("Depth Peeling", DepthPeelingRenderer)
register_renderer("Atomic Loop 64-Bit", AtomicLoop64Renderer)
register_renderer("MLAB (Buckets)", MLABBucketRenderer)
register_renderer("Depth Complexity", DepthComplexityRenderer)
register_renderer("Opacity Optimization", OpacityOptimizationRendererMode)
register_renderer("Vulkan Ray Tracer", VulkanRayTracerRenderer)
register_renderer("RTAO", RtaoRenderer)


def _register_scattering_modes():
    from linevis_tpu.render.line_density_map import LineDensityMapRenderer
    from linevis_tpu.render.spherical_heatmap import SphericalHeatMapRenderer
    from linevis_tpu.render.vpt import VolumetricPathTracerRenderer
    from linevis_tpu.render.vrc import VoxelRayCastingRenderer

    register_renderer("Line Density Map Renderer", LineDensityMapRenderer)
    register_renderer("Spherical Heat Map Renderer", SphericalHeatMapRenderer)
    register_renderer("Voxel Ray Casting", VoxelRayCastingRenderer)
    register_renderer("Volumetric Path Tracer", VolumetricPathTracerRenderer)

    from linevis_tpu.scene.triangle_mesh_data import TriangleMeshRenderer

    register_renderer("Opaque (Triangle Mesh)", TriangleMeshRenderer)


_register_scattering_modes()

RENDERING_MODE_ALL = tuple(_REGISTRY.keys()) + tuple(_LAZY_REGISTRY.keys())


def create_renderer(mode_name: str, settings: Optional[SettingsMap] = None) -> LineRenderer:
    """Factory (MainApp::setRenderer). Unknown modes fall back to Opaque
    with a warning, mirroring MainApp.cpp:864-874."""
    cls = _REGISTRY.get(mode_name)
    if cls is None and mode_name in _LAZY_REGISTRY:
        import importlib

        mod, attr = _LAZY_REGISTRY[mode_name]
        cls = getattr(importlib.import_module(mod), attr)
        _REGISTRY[mode_name] = cls
    if cls is None:
        warnings.warn(
            f"Rendering mode {mode_name!r} is not supported yet; "
            f"falling back to Opaque (available: {sorted(_REGISTRY)})"
        )
        cls = OpaqueLineRenderer
    return cls(settings)
