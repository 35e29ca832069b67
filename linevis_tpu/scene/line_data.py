"""`LineData` scene model: attributes, filters, cached GPU representations.

Behavioral port of the reference's abstract `LineData`
(`src/LineData/LineData.hpp:86`): it owns the attribute list and selected
attribute, a filter chain, per-attribute min/max statistics, and *caches
every device representation* with dirty-flag invalidation
(`rebuildInternalRepresentationIfNecessary`, `LineData.cpp:449-511`). The
TPU representations are the capsule scene (primary renderer + RT) and the
tube triangle mesh (triangle raster path) instead of Vulkan VBO/BLAS
bundles, but the caching discipline is the same: representations are
rebuilt lazily on access after any change to filters, selected attribute
or line width, and stale representations are dropped.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from linevis_tpu.core.settings import SettingsMap
from linevis_tpu.core.trajectories import Trajectories, compute_trajectories_aabb
from linevis_tpu.loaders.flow_file import load_flow_trajectories_from_file
from linevis_tpu.scene.filters import LineFilter

__all__ = ["LineData", "LineDataFlow"]

# Reference line-width default: STANDARD_LINE_WIDTH = 0.002
# (src/Renderers/LineRenderer.hpp:266-276); radius = width / 2.
STANDARD_LINE_WIDTH = 0.002


class LineData:
    """Base scene object for a loaded line dataset."""

    data_set_type = "lines"

    def __init__(self, trajectories: Trajectories, name: str = ""):
        self.name = name
        self.trajectories = trajectories
        self.attribute_names: List[str] = list(trajectories.attribute_names)
        self.selected_attribute_index: int = 0
        self.line_width: float = STANDARD_LINE_WIDTH
        self.filters: List[LineFilter] = []
        self.dirty: bool = True
        self._filter_mask: Optional[np.ndarray] = None
        self._cache: Dict = {}

    # -- statistics (LineData.hpp getters) --------------------------------
    @property
    def num_lines(self) -> int:
        return self.trajectories.num_lines

    @property
    def num_line_points(self) -> int:
        return int(self.trajectories.mask.sum())

    @property
    def num_line_segments(self) -> int:
        return int(self.trajectories.segment_mask().sum())

    def get_attribute_range(self, index: Optional[int] = None):
        idx = self.selected_attribute_index if index is None else index
        vals = self.trajectories.attributes[:, idx]
        m = self.trajectories.mask
        if not m.any():
            return (0.0, 1.0)
        return (float(vals[m].min()), float(vals[m].max()))

    def get_aabb(self) -> np.ndarray:
        return compute_trajectories_aabb(self.trajectories)

    # -- configuration -----------------------------------------------------
    def set_selected_attribute(self, index_or_name) -> None:
        if isinstance(index_or_name, str):
            index_or_name = self.attribute_names.index(index_or_name)
        if index_or_name != self.selected_attribute_index:
            self.selected_attribute_index = int(index_or_name)
            self.mark_dirty()

    def set_line_width(self, width: float) -> None:
        if width != self.line_width:
            self.line_width = float(width)
            self.mark_dirty()

    def add_filter(self, f: LineFilter) -> None:
        self.filters.append(f)
        self.mark_dirty()

    def clear_filters(self) -> None:
        if self.filters:
            self.filters = []
            self.mark_dirty()

    def set_new_settings(self, settings: SettingsMap) -> None:
        """Apply a settings map (reference setNewSettings mechanism)."""
        if settings.has_key("line_width"):
            self.set_line_width(settings.get_float("line_width"))
        if settings.has_key("attribute"):
            self.set_selected_attribute(settings.get_value("attribute"))

    def mark_dirty(self) -> None:
        self.dirty = True
        self._cache.clear()
        self._filter_mask = None

    # -- filtered data ------------------------------------------------------
    def get_filter_mask(self) -> np.ndarray:
        """[L] keep mask from the filter chain (filterData analogue)."""
        if self._filter_mask is None:
            mask = np.ones((self.num_lines,), bool)
            for f in self.filters:
                if f.enabled:
                    mask &= f.filter(self.trajectories)
            self._filter_mask = mask
        return self._filter_mask

    def get_filtered_point_mask(self) -> np.ndarray:
        """[L, P] point mask with filtered lines removed."""
        keep = self.get_filter_mask()
        return self.trajectories.mask & keep[:, None]

    def selected_attributes(self) -> np.ndarray:
        return self.trajectories.attributes[:, self.selected_attribute_index]

    # -- cached device representations (LineData.cpp:449-511 discipline) ----
    def get_capsule_scene(self):
        """Primary render representation (replaces the VBO/BLAS zoo)."""
        key = ("capsules", self.line_width, self.selected_attribute_index)
        if key not in self._cache:
            from linevis_tpu.render.tube_raster import build_capsule_scene

            self._cache[key] = build_capsule_scene(
                self.trajectories.positions,
                self.get_filtered_point_mask(),
                self.selected_attributes(),
                radius=self.line_width / 2.0,
            )
            self.dirty = False
        return self._cache[key]

    def get_prism_scene(self, num_subdivisions: int = 8):
        """Analytic N-gon prism representation — the reference's raster
        triangle-tube geometry (`Tubes.hpp:40`, `LineData.hpp:374-386`)
        rendered by `kernels/raster_prism.py` at capsule-kernel speed."""
        key = ("prisms", self.line_width, self.selected_attribute_index,
               num_subdivisions)
        if key not in self._cache:
            from linevis_tpu.render.tube_raster import build_prism_scene

            self._cache[key] = build_prism_scene(
                self.trajectories.positions,
                self.get_filtered_point_mask(),
                self.selected_attributes(),
                radius=self.line_width / 2.0,
                n_sides=num_subdivisions,
            )
            self.dirty = False
        return self._cache[key]

    def get_tube_mesh(self, num_subdivisions: int = 8):
        """Triangle-tube representation (reference tubeNumSubdivisions=8)."""
        key = ("tubes", self.line_width, self.selected_attribute_index,
               num_subdivisions)
        if key not in self._cache:
            from linevis_tpu.geometry.tubes import build_tube_triangle_mesh

            self._cache[key] = build_tube_triangle_mesh(
                self.trajectories.positions,
                self.get_filtered_point_mask(),
                self.selected_attributes(),
                radius=self.line_width / 2.0,
                num_subdivisions=num_subdivisions,
            )
            self.dirty = False
        return self._cache[key]

    def get_line_segments(self):
        key = ("segments", self.selected_attribute_index)
        if key not in self._cache:
            from linevis_tpu.geometry.segments import build_line_segments

            self._cache[key] = build_line_segments(
                self.trajectories.positions,
                self.get_filtered_point_mask(),
                self.selected_attributes(),
            )
        return self._cache[key]


class LineDataFlow(LineData):
    """Flow trajectories (reference `LineDataFlow`, LineDataFlow.hpp:35).

    Optional ribbon rendering (`LineDataFlow.hpp:158-161`): per-point
    ribbon right-vectors (from .binlines v2 files or `trace_streamribbons`)
    feed elliptic band geometry.  Helicity bands (`:163-171`): the band
    right-vector rotates around the tangent proportionally to the helicity
    attribute times `helicity_rotation_factor`.
    """

    data_set_type = "flow"

    def __init__(self, trajectories: Trajectories, name: str = ""):
        super().__init__(trajectories, name=name)
        self.ribbon_directions: Optional[np.ndarray] = None  # [L, P, 3]
        self.use_ribbons = False
        self.helicity_rotation_factor = 1.0

    def set_ribbon_directions(self, dirs: np.ndarray) -> None:
        self.ribbon_directions = np.asarray(dirs, np.float32)
        self.use_ribbons = True
        self.mark_dirty()

    def get_ribbon_mesh(
        self, band_width: float = 0.005, num_subdivisions: int = 8
    ):
        """Flow-ribbon band geometry from the ribbon right-vectors."""
        if self.ribbon_directions is None:
            raise ValueError("no ribbon directions loaded/traced")
        key = ("ribbons", band_width, num_subdivisions,
               self.selected_attribute_index)
        if key not in self._cache:
            from linevis_tpu.geometry.bands import build_band_tube_mesh

            self._cache[key] = build_band_tube_mesh(
                self.trajectories.positions,
                self.get_filtered_point_mask(),
                self.selected_attributes(),
                self.ribbon_directions,
                band_width=band_width,
                num_subdivisions=num_subdivisions,
            )
        return self._cache[key]

    def get_helicity_band_mesh(
        self, band_width: float = 0.005, num_subdivisions: int = 8,
        helicity_attribute: str = "Helicity",
    ):
        """Helicity-rotating bands (LineDataFlow.hpp:163-171): the right
        vector starts at the parallel-transport normal and accumulates a
        twist angle of helicity * factor per step."""
        key = ("helicity_bands", band_width, num_subdivisions,
               self.helicity_rotation_factor)
        if key not in self._cache:
            import jax.numpy as jnp

            from linevis_tpu.geometry.bands import build_band_tube_mesh
            from linevis_tpu.geometry.frames import (
                compute_tangents,
                parallel_transport_frames,
            )

            try:
                h_idx = self.attribute_names.index(helicity_attribute)
            except ValueError:
                h_idx = self.selected_attribute_index
            hel = jnp.asarray(self.trajectories.attributes[:, h_idx])
            hmax = jnp.maximum(jnp.max(jnp.abs(hel)), 1e-12)
            angle = jnp.cumsum(
                hel / hmax * self.helicity_rotation_factor, axis=1
            )
            pos = jnp.asarray(self.trajectories.positions)
            m = jnp.asarray(self.get_filtered_point_mask())
            normals, binormals, _ = parallel_transport_frames(pos, m)
            right = (
                jnp.cos(angle)[..., None] * normals
                + jnp.sin(angle)[..., None] * binormals
            )
            self._cache[key] = build_band_tube_mesh(
                pos, m, self.selected_attributes(), right,
                band_width=band_width, num_subdivisions=num_subdivisions,
            )
        return self._cache[key]

    @classmethod
    def load_from_file(
        cls,
        filename: str,
        name: str = "",
        transform: Optional[np.ndarray] = None,
        attribute_names: Optional[List[str]] = None,
    ) -> "LineDataFlow":
        traj = load_flow_trajectories_from_file(filename, transform=transform)
        obj = cls(traj, name=name or filename)
        if attribute_names:
            obj.attribute_names = list(attribute_names) + obj.attribute_names[
                len(attribute_names):
            ]
        return obj
