"""Transfer functions: piecewise-linear color + opacity maps.

Reference: sgl `TransferFunctionWindow` with XML files in
`Data/TransferFunctions/*.xml` (colorspace sRGB, interpolation in linear
RGB — see `Standard.xml`). TPU-native: the TF is baked to a fixed-size
lookup table evaluated with `jnp.interp`-style gather inside the shading
kernels.
"""

from __future__ import annotations

import dataclasses
import xml.etree.ElementTree as ET
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["TransferFunction", "srgb_to_linear", "linear_to_srgb"]


def srgb_to_linear(c):
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    if isinstance(c, jnp.ndarray):
        c = jnp.clip(c, 0.0, 1.0)
        return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


@dataclasses.dataclass
class TransferFunction:
    """Baked LUT: table [N, 4] linear-RGB + opacity over position in [0,1]."""

    table: np.ndarray  # [N, 4] float32, linear RGB + alpha
    value_range: Tuple[float, float] = (0.0, 1.0)

    RESOLUTION = 256

    @classmethod
    def from_points(
        cls,
        color_points: Sequence[Tuple[float, float, float, float]],  # (pos, r, g, b) 0-255
        opacity_points: Sequence[Tuple[float, float]] = ((0.0, 1.0), (1.0, 1.0)),
        value_range: Tuple[float, float] = (0.0, 1.0),
    ) -> "TransferFunction":
        n = cls.RESOLUTION
        xs = np.linspace(0.0, 1.0, n)
        cp = np.asarray(color_points, np.float64)
        op = np.asarray(opacity_points, np.float64)
        # Interpolate in linear RGB (reference interpolation_colorspace).
        rgb_lin = srgb_to_linear(cp[:, 1:4] / 255.0)
        table = np.zeros((n, 4), np.float32)
        for ch in range(3):
            table[:, ch] = np.interp(xs, cp[:, 0], rgb_lin[:, ch])
        table[:, 3] = np.interp(xs, op[:, 0], op[:, 1])
        return cls(table=table, value_range=value_range)

    @classmethod
    def from_xml(cls, filename: str, value_range=(0.0, 1.0)) -> "TransferFunction":
        root = ET.parse(filename).getroot()
        color_points = [
            (
                float(p.get("position")),
                float(p.get("r")),
                float(p.get("g")),
                float(p.get("b")),
            )
            for p in root.find("ColorPoints")
        ]
        ops = root.find("OpacityPoints")
        opacity_points = (
            [(float(p.get("position")), float(p.get("opacity"))) for p in ops]
            if ops is not None
            else [(0.0, 1.0), (1.0, 1.0)]
        )
        return cls.from_points(color_points, opacity_points, value_range)

    @classmethod
    def standard(cls) -> "TransferFunction":
        """The reference's Standard.xml (blue-white-red diverging)."""
        return cls.from_points(
            [
                (0.0, 59, 76, 192),
                (0.25, 144, 178, 254),
                (0.5, 220, 220, 220),
                (0.75, 245, 156, 125),
                (1.0, 180, 4, 38),
            ]
        )

    @classmethod
    def viridis_like(cls) -> "TransferFunction":
        """The reference's Viridis.xml points (inverted viridis ramp)."""
        return cls.from_points(
            [
                (0.0, 252, 229, 30),
                (0.25, 81, 195, 78),
                (0.5, 31, 129, 121),
                (0.75, 45, 62, 120),
                (1.0, 52, 0, 66),
            ]
        )

    def lookup(self, values: jnp.ndarray) -> jnp.ndarray:
        """Map attribute values [...,] -> RGBA [..., 4] (linear RGB).

        Gather-based LUT sample with linear interpolation between entries.
        """
        lo, hi = self.value_range
        t = jnp.clip((values - lo) / max(hi - lo, 1e-9), 0.0, 1.0)
        table = jnp.asarray(self.table)
        n = table.shape[0]
        f = t * (n - 1)
        i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, n - 2)
        w = (f - i0)[..., None]
        return table[i0] * (1.0 - w) + table[i0 + 1] * w
