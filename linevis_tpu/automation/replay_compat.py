"""Compatibility shims so the reference's replay scripts run unmodified.

The reference's `Data/ReplayScripts/*.py` do `import g` (the embedded
CPython module, ReplayWidget.cpp:576-624) and
`from modules.campath import camera_path_circle`.  `load_script`
temporarily installs module objects for both; this file provides the
`modules.campath` implementation — an independent implementation of the
same API: a circle flight whose parameter is eased by a cubic Bezier
timing curve (acceleration = control-point pull-in), emitted as
`set_duration` keyframes through the g API.
"""

from __future__ import annotations

import math
import sys
import types

__all__ = ["install_compat_modules", "remove_compat_modules"]


def _bezier_timing(x: float, accel_start: float, accel_end: float) -> float:
    """y(x) of the cubic Bezier with control points (0,0),
    (accel_start, 0), (1-accel_end, 1), (1,1): slow start/end, linear
    middle. Solved for the parameter by bisection (monotone in x)."""
    p1x, p2x = accel_start, 1.0 - accel_end

    def bx(t):
        mt = 1.0 - t
        return 3 * mt * mt * t * p1x + 3 * mt * t * t * p2x + t ** 3

    def by(t):
        mt = 1.0 - t
        return 3 * mt * t * t + t ** 3  # p1y=0, p2y=1, p3y=1

    lo, hi = 0.0, 1.0
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        if bx(mid) < x:
            lo = mid
        else:
            hi = mid
    return by(0.5 * (lo + hi))


def _make_campath(g):
    mod = types.ModuleType("modules.campath")

    def camera_path_circle(
        angle_start, angle_end, radius_start, radius_end, total_time,
        pitch=0.0, center=(0.0, 0.0, 0.0), acceleration=0.4,
        acceleration_start=None, acceleration_end=None,
        radius_functor=None, subdivisions=64,
    ):
        if acceleration_start is None:
            acceleration_start = acceleration
        if acceleration_end is None:
            acceleration_end = acceleration
        g.set_duration(0.0)
        prev_time = 0.0
        for i in range(subdivisions + 1):
            t = _bezier_timing(
                i / subdivisions, acceleration_start, acceleration_end
            )
            time = t * total_time
            angle = angle_start + t * (angle_end - angle_start)
            radius = (
                radius_functor(t) if radius_functor is not None
                else radius_start + t * (radius_end - radius_start)
            )
            pos = (
                math.cos(angle) * math.cos(pitch) * radius + center[0],
                math.sin(pitch) * radius + center[1],
                math.sin(angle) * math.cos(pitch) * radius + center[2],
            )
            g.set_camera_position(pos)
            g.set_camera_look_at(tuple(center))
            g.set_duration(max(time - prev_time, 0.0))
            prev_time = time

    mod.camera_path_circle = camera_path_circle
    return mod


def install_compat_modules(g) -> dict:
    """Install `g`, `modules`, `modules.campath` into sys.modules; returns
    the previous entries for `remove_compat_modules`."""
    saved = {
        name: sys.modules.get(name)
        for name in ("g", "modules", "modules.campath")
    }
    gmod = types.ModuleType("g")
    for name in dir(g):
        if not name.startswith("_"):
            setattr(gmod, name, getattr(g, name))
    pkg = types.ModuleType("modules")
    pkg.__path__ = []  # mark as package
    campath = _make_campath(g)
    pkg.campath = campath
    sys.modules["g"] = gmod
    sys.modules["modules"] = pkg
    sys.modules["modules.campath"] = campath
    return saved


def remove_compat_modules(saved: dict) -> None:
    for name, mod in saved.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod
