"""`TriangleMeshData`: triangle surface datasets in the scene model.

Port of `src/LineData/TriangleMesh/TriangleMeshData.hpp:39`: .obj/.stl
surface meshes rendered with the same shading / transfer-function stack
as the line datasets, with the computed curvature attribute as the
default scalar.  Participates in the renderer registry through its own
renderer (the line renderers require a capsule scene).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from linevis_tpu.core.settings import SettingsMap
from linevis_tpu.loaders.mesh_loader import SurfaceMesh, load_surface_mesh

__all__ = ["TriangleMeshData", "TriangleMeshRenderer"]


class TriangleMeshData:
    data_set_type = "triangle_mesh"

    def __init__(self, mesh: SurfaceMesh, name: str = ""):
        self.name = name
        self.mesh = mesh
        self.attribute_names = ["Curvature"]
        self.selected_attribute_index = 0
        self.dirty = True

    @classmethod
    def load_from_file(cls, filename: str, name: str = "",
                       normalize: bool = True) -> "TriangleMeshData":
        mesh = load_surface_mesh(filename)
        if normalize:
            v = mesh.vertices
            lo, hi = v.min(axis=0), v.max(axis=0)
            center = (lo + hi) * 0.5
            scale = 1.0 / max(float((hi - lo).max()), 1e-12)
            mesh.vertices = ((v - center) * scale).astype(np.float32)
        return cls(mesh, name=name or filename)

    @property
    def num_vertices(self) -> int:
        return int(self.mesh.vertices.shape[0])

    @property
    def num_triangles(self) -> int:
        return int(self.mesh.triangles.shape[0])

    def get_aabb(self) -> np.ndarray:
        return np.stack(
            [self.mesh.vertices.min(axis=0), self.mesh.vertices.max(axis=0)]
        )

    def set_new_settings(self, settings: SettingsMap) -> None:
        pass


class TriangleMeshRenderer:
    """Registry renderer drawing TriangleMeshData surfaces opaquely."""

    name = "Opaque (Triangle Mesh)"

    def __init__(self, settings: Optional[SettingsMap] = None):
        from linevis_tpu.render.transfer_function import TransferFunction

        self.line_data: Optional[TriangleMeshData] = None
        self.transfer_function = TransferFunction.standard()
        self.depth_cue_strength = 0.0

    def set_line_data(self, data) -> None:
        self.line_data = data

    def set_transfer_function(self, tf) -> None:
        self.transfer_function = tf

    def set_new_settings(self, settings) -> None:
        if settings.has_key("depth_cue_strength"):
            self.depth_cue_strength = settings.get_float("depth_cue_strength")

    def render(self, camera) -> np.ndarray:
        from linevis_tpu.render.pipeline import RasterSettings
        from linevis_tpu.render.surface import render_surface_image

        # Surface triangles can be arbitrarily large on screen (unlike the
        # tube micro-triangles), so size the binning window from the
        # projected triangle bounding boxes for THIS camera (span is a
        # static shape parameter of the binning).
        mesh = self.line_data.mesh
        vp = np.asarray(camera.view_projection_matrix())
        v = mesh.vertices
        clip = v @ vp[:3, :3].T + vp[:3, 3]
        w = v @ vp[3, :3] + vp[3, 3]
        w = np.where(np.abs(w) < 1e-4, 1e-4, w)
        sx = (clip[:, 0] / w * 0.5 + 0.5) * camera.width
        sy = (0.5 - clip[:, 1] / w * 0.5) * camera.height
        sx = np.clip(sx, -camera.width, 2 * camera.width)
        sy = np.clip(sy, -camera.height, 2 * camera.height)
        t = mesh.triangles
        tile_w, tile_h = 16, 8
        ex = (sx[t].max(1) - sx[t].min(1)) / tile_w
        ey = (sy[t].max(1) - sy[t].min(1)) / tile_h
        front = (w[t] > 0).all(1)
        span_x = int(np.ceil(ex[front].max())) + 2 if front.any() else 2
        span_y = int(np.ceil(ey[front].max())) + 2 if front.any() else 2
        span_x = min(span_x, -(-camera.width // tile_w))
        span_y = min(span_y, -(-camera.height // tile_h))

        settings = RasterSettings(
            width=camera.width, height=camera.height,
            tile_w=tile_w, tile_h=tile_h,
            span_x=span_x, span_y=span_y,
            depth_cue_strength=self.depth_cue_strength,
        )
        return render_surface_image(
            self.line_data.mesh, camera, tf=self.transfer_function,
            settings=settings,
        )
