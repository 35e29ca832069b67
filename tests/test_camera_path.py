"""Camera path + replay interpolation tests."""

import numpy as np

from linevis_tpu.automation.camera_path import CameraPath, ControlPoint
from linevis_tpu.automation.replay import _quat_rotate, slerp


def test_slerp_endpoints_and_midpoint():
    q0 = np.array([0, 0, 0, 1], np.float32)  # identity
    # 90 deg about y
    s = np.sin(np.pi / 4)
    q1 = np.array([0, s, 0, np.cos(np.pi / 4)], np.float32)
    np.testing.assert_allclose(slerp(q0, q1, 0.0), q0, atol=1e-6)
    np.testing.assert_allclose(np.abs(slerp(q0, q1, 1.0)), np.abs(q1), atol=1e-6)
    mid = slerp(q0, q1, 0.5)  # 45 deg about y
    v = _quat_rotate(mid, (0, 0, -1))
    ang = np.degrees(np.arctan2(-v[0], -v[2]))
    assert abs(ang - 45.0) < 0.1, ang


def test_binpath_roundtrip(tmp_path):
    cps = [
        ControlPoint(0.0, np.array([1, 2, 3], np.float32),
                     np.array([0, 0, 0, 1], np.float32)),
        ControlPoint(2.5, np.array([4, 5, 6], np.float32),
                     np.array([0, 0.7071, 0, 0.7071], np.float32)),
    ]
    p = CameraPath(cps)
    f = str(tmp_path / "cam.binpath")
    p.save_to_binary_file(f)
    q = CameraPath.from_binary_file(f)
    assert len(q.control_points) == 2
    np.testing.assert_allclose(q.control_points[1].position, [4, 5, 6])
    np.testing.assert_allclose(q.control_points[1].time, 2.5)
    pos, quat = q.interpolate(1.25)
    np.testing.assert_allclose(pos, [2.5, 3.5, 4.5], atol=1e-5)


def test_circle_path_looks_at_center():
    aabb = np.array([[-0.5, -0.2, -0.5], [0.5, 0.2, 0.5]], np.float32)
    path = CameraPath.from_circle_path(aabb, total_time=8.0)
    assert path.total_time == 8.0
    for t in (0.0, 2.0, 5.3):
        pos, quat = path.interpolate(t)
        fwd = _quat_rotate(quat, (0, 0, -1))
        to_center = -pos + np.array([0, pos[1], 0])
        # forward direction aims at the vertical axis through the center
        cos = np.dot(fwd, to_center) / (
            np.linalg.norm(fwd) * max(np.linalg.norm(to_center), 1e-9)
        )
        assert cos > 0.95, (t, cos)


def test_replay_settings_interpolation_and_quat():
    """Numeric renderer settings lerp per frame; camera orientation slerps
    (ReplayWidget.hpp:104-160, .cpp:870)."""
    from linevis_tpu.automation.replay import ReplayWidget

    seen = []

    class FakeRenderer:
        name = "fake"
        line_data = object()

        def __init__(self, *_):
            self.vals = {}

        def set_line_data(self, ld):
            pass

        def set_new_settings(self, s):
            for k, v in s.items():
                self.vals[k] = v

        def set_transfer_function(self, tf):
            pass

        def render(self, cam):
            seen.append((dict(self.vals), np.asarray(cam.position),
                         np.asarray(cam.look_at_point)))
            return np.zeros((2, 2, 4), np.float32)

    import linevis_tpu.render.renderer as rmod
    rmod.register_renderer("FakeTest", FakeRenderer)

    w = ReplayWidget(dataset_loader=lambda name: object(), fps=2.0)
    w.load_script(
        "g.set_renderer('FakeTest')\n"
        "g.set_rendering_algorithm_settings({'opacity_q': 0.0})\n"
        "g.set_duration(1.0)\n"
        "g.set_rendering_algorithm_settings({'opacity_q': 1.0})\n"
        "g.set_camera_orientation_quaternion([0, 0, 0, 1])\n"
        "g.set_duration(0)\n"
    )
    n = w.run(width=2, height=2)
    assert n == 2  # 1 s at 2 fps
    qs = [float(v["opacity_q"]) for v, _, _ in seen]
    np.testing.assert_allclose(qs, [0.5, 1.0], atol=1e-6)


def test_reference_script_compat():
    """A reference-style script (`import g`, modules.campath) loads
    unmodified and produces keyframes."""
    from linevis_tpu.automation.replay import ReplayWidget

    script = """
import math
from modules.campath import camera_path_circle
import g

g.set_duration(0)
g.set_renderer('Opaque')
g.set_camera_fovy_deg(math.degrees(0.7))
g.set_camera_yaw_pitch_rad(0.5, 0.1)
g.set_camera_look_at_location((0.0, 0.0, 0.0))
g.set_transfer_function_range(0.1, 0.9)
g.set_duration(0.5)
camera_path_circle(0.0, math.pi, 1.0, 1.0, 2.0, subdivisions=8)
"""
    w = ReplayWidget(dataset_loader=lambda name: object(), fps=4.0)
    w.load_script(script)
    # 2 explicit keyframes + 9 circle keyframes (+ trailing commit).
    assert len(w.states) >= 11
    total = sum(s.duration for s in w.states)
    assert abs(total - 2.5) < 1e-3, total
    # Circle keyframes look at the center with radius-1 positions.
    pos_states = [s for s in w.states if s.camera_position is not None]
    p = pos_states[-1].camera_position
    assert abs(np.linalg.norm(p) - 1.0) < 1e-4
    # TF range recorded.
    assert any(s.transfer_function_range == (0.1, 0.9) for s in w.states)
    # Fovy alias: radians
    assert any(
        s.camera_fovy is not None and abs(s.camera_fovy - 0.7) < 1e-6
        for s in w.states
    )
    # sys.modules restored
    import sys
    assert "modules.campath" not in sys.modules


def test_replay_script_replay_function_convention():
    """Reference scripts define replay() and the widget calls it after
    import (ReplayWidget.cpp:700-702); inline scripts keep working."""
    from linevis_tpu.automation.replay import ReplayWidget

    w = ReplayWidget(lambda name: None)
    w.load_script(
        "import g\n"
        "def init_scene():\n"
        "    g.set_duration(0)\n"
        "    g.set_renderer('Opaque')\n"
        "def replay():\n"
        "    init_scene()\n"
        "    g.set_duration(2)\n"
        "    g.set_camera_position(0.1, 0.2, 1.0)\n"
    )
    states = [s for s in w.states if s.duration or s.renderer]
    assert any(s.renderer == "Opaque" for s in w.states)
    assert any(abs(s.duration - 2.0) < 1e-9 for s in w.states)


def test_all_reference_replay_scripts_load():
    """Every script in the reference's Data/ReplayScripts/ loads through
    the compat shims and produces keyframe states (parity of the g.* and
    modules.campath API surface). Skipped when the reference tree is
    absent."""
    import glob
    import os
    import warnings

    import pytest as _pytest

    from linevis_tpu.automation.replay import ReplayWidget

    scripts = sorted(glob.glob("/root/reference/Data/ReplayScripts/*.py"))
    if not scripts:
        _pytest.skip("reference tree not available")
    for path in scripts:
        w = ReplayWidget(lambda name: None)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # unknown camera checkpoints
            w.load_script(path)
        assert len(w.states) > 1, os.path.basename(path)


def test_replay_camera_flight_mode():
    """set_use_camera_flight(True): the camera follows the circle path
    around the data AABB (MainApp.cpp:2417) instead of scripted
    positions; frames must differ along the flight."""
    import numpy as np

    from linevis_tpu.automation.replay import ReplayWidget
    from tests.golden_scenes import _line_data

    caps = []
    w = ReplayWidget(lambda name: _line_data(seed=3), fps=2.0)
    w.frame_callback = lambda i, img: caps.append(img)
    w.load_script(
        "g.set_duration(0)\n"
        "g.set_dataset('x')\n"
        "g.set_renderer('Opaque')\n"
        "g.set_use_camera_flight(True)\n"
        "g.set_duration(1.5)\n"
    )
    n = w.run(width=64, height=48)
    assert n == 3
    assert all(np.isfinite(c).all() for c in caps)
    assert not np.allclose(caps[0], caps[-1])
