"""End-to-end opaque render test (small scene, CPU)."""

import numpy as np

from linevis_tpu.geometry.tubes import build_tube_triangle_mesh
from linevis_tpu.render.camera import Camera
from linevis_tpu.render.opaque import render_opaque_image
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.transfer_function import TransferFunction


def _scene():
    # One horizontal line through the origin.
    P = 16
    pos = np.zeros((1, P, 3), np.float32)
    pos[0, :, 0] = np.linspace(-0.4, 0.4, P)
    mask = np.ones((1, P), bool)
    attrs = np.linspace(0, 1, P, dtype=np.float32)[None]
    return build_tube_triangle_mesh(pos, mask, attrs, radius=0.05,
                                    num_subdivisions=8)


def test_render_opaque_smoke():
    mesh = _scene()
    cam = Camera(position=(0, 0, 1.5), width=128, height=96)
    settings = RasterSettings(
        width=128, height=96, tile_w=32, tile_h=16, chunk=32, span_x=4, span_y=4,
    )
    img = render_opaque_image(mesh, cam, TransferFunction.standard(), settings)
    assert img.shape == (96, 128, 4)
    assert np.isfinite(img).all()
    # Background is white; the tube must cover the center row.
    center = img[48, :, :3]
    assert (center < 0.999).any(axis=-1).any(), "tube not visible"
    # Corners are background.
    np.testing.assert_allclose(img[0, 0, :3], 1.0)
    np.testing.assert_allclose(img[-1, -1, :3], 1.0)
    # Tube occupies a horizontal band: rows far from center are background.
    assert (img[2, :, :3] > 0.999).all()


def test_render_deterministic():
    mesh = _scene()
    cam = Camera(position=(0, 0.2, 1.2), width=64, height=64)
    settings = RasterSettings(
        width=64, height=64, tile_w=32, tile_h=16, chunk=32,
    )
    a = render_opaque_image(mesh, cam, settings=settings)
    b = render_opaque_image(mesh, cam, settings=settings)
    np.testing.assert_array_equal(a, b)
