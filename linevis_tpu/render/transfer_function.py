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

__all__ = ["TransferFunction", "srgb_to_linear", "linear_to_srgb", "tf_eval_points"]


def tf_eval_points(color_pts, opacity_pts, x: jnp.ndarray):
    """Gather-free piecewise-linear TF evaluation.

    color_pts: static tuple of (pos, r, g, b) in LINEAR RGB; opacity_pts:
    static tuple of (pos, a). x [...] in [0, 1] -> (rgb [3, ...], alpha).
    The loop over control points is unrolled at trace time (K is tiny), so
    evaluation is pure elementwise math — no LUT gather (TPU gathers cost
    ~10ns/element).
    """
    xc = jnp.clip(x, 0.0, 1.0)

    def eval_channels(pts, nch):
        outs = [jnp.full(x.shape, float(pts[0][1 + c]), jnp.float32)
                for c in range(nch)]
        K = len(pts)
        for k in range(K - 1):
            p0 = float(pts[k][0])
            p1 = float(pts[k + 1][0])
            seg = (xc >= p0) & (xc <= p1)
            w = (xc - p0) / max(p1 - p0, 1e-9)
            for c in range(nch):
                v0 = float(pts[k][1 + c])
                v1 = float(pts[k + 1][1 + c])
                outs[c] = jnp.where(seg, v0 + w * (v1 - v0), outs[c])
        return outs

    rgb = eval_channels(color_pts, 3)
    a = eval_channels(opacity_pts, 1)[0]
    return jnp.stack(rgb, axis=0), a


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
    """Piecewise-linear TF: control points + baked LUT.

    `color_points_linear` [Kc, 4] (pos, r, g, b in linear RGB) and
    `opacity_points` [Ko, 2] feed the gather-free elementwise evaluator
    (`eval_points`, used by shading kernels — TPU gathers are slow);
    `table` [N, 4] is the baked LUT for generic consumers.
    """

    table: np.ndarray  # [N, 4] float32, linear RGB + alpha
    value_range: Tuple[float, float] = (0.0, 1.0)
    color_points_linear: np.ndarray = None  # [Kc, 4]
    opacity_points_np: np.ndarray = None  # [Ko, 2]

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
        return cls(
            table=table,
            value_range=value_range,
            color_points_linear=np.concatenate(
                [cp[:, :1], rgb_lin], axis=1
            ).astype(np.float32),
            opacity_points_np=op.astype(np.float32),
        )

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

    def points_arrays(self):
        """(color [Kc,4], opacity [Ko,2]) jnp arrays for eval_points."""
        return (
            jnp.asarray(self.color_points_linear),
            jnp.asarray(self.opacity_points_np),
        )

    def as_static_points(self):
        """Hashable (color, opacity) point tuples for tf_eval_points."""
        c = tuple(tuple(float(v) for v in row) for row in self.color_points_linear)
        o = tuple(tuple(float(v) for v in row) for row in self.opacity_points_np)
        return c, o

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
