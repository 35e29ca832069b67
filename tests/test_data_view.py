"""Multi-view DataView compositor tests."""

import numpy as np

from linevis_tpu.core.trajectories import Trajectories
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.data_view import DataView, MultiViewCompositor
from linevis_tpu.scene.line_data import LineData


def _line_data():
    rng = np.random.default_rng(6)
    L, P = 4, 6
    pos = np.cumsum(rng.normal(0, 0.08, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    traj = Trajectories(
        positions=pos,
        attributes=rng.uniform(0, 1, (L, 1, P)).astype(np.float32),
        mask=np.ones((L, P), bool),
        num_points=np.full((L,), P, np.int32),
        attribute_names=["a"],
    )
    ld = LineData(traj)
    ld.set_line_width(0.05)
    return ld


def test_two_views_tiled():
    ld = _line_data()
    cam = Camera(position=(0.0, 0.1, 1.2), width=32, height=16)
    views = [
        DataView("Opaque", camera=cam),
        DataView("Depth Complexity", camera=cam),
    ]
    comp = MultiViewCompositor(views, gap=2)
    comp.set_line_data(ld)
    img = comp.render()
    assert img.shape == (16, 32 * 2 + 2, 4)
    assert np.isfinite(img).all()
    left = img[:, :32]
    right = img[:, 34:]
    # Different renderers -> different images of the same scene.
    assert not np.allclose(left, right)
    # Gap column stays zero.
    assert (img[:, 32:34] == 0).all()


def test_camera_sync():
    ld = _line_data()
    views = [
        DataView("Opaque", camera=Camera(position=(0, 0, 2), width=32, height=16)),
        DataView("Opaque", camera=Camera(position=(2, 0, 0), width=32, height=16)),
    ]
    comp = MultiViewCompositor(views)
    comp.set_line_data(ld)
    a = views[0].render()
    b = views[1].render()
    assert not np.allclose(a, b)
    comp.sync_cameras(Camera(position=(0.0, 0.1, 1.2), width=8, height=8))
    a2 = views[0].render()
    b2 = views[1].render()
    np.testing.assert_allclose(a2, b2)
