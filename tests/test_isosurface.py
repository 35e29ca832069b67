"""Marching-tetrahedra isosurface extraction tests."""

import numpy as np

from linevis_tpu.geometry.isosurface import extract_isosurface


def _sphere_field(res=32, radius=0.35):
    g = np.mgrid[0:res, 0:res, 0:res].astype(np.float32) / (res - 1) - 0.5
    r = np.sqrt((g ** 2).sum(axis=0))
    return radius - r  # positive inside


def test_sphere_isosurface_geometry():
    res, radius = 32, 0.35
    field = _sphere_field(res, radius)
    spacing = np.full(3, 1.0 / (res - 1), np.float32)
    mesh = extract_isosurface(field, iso=0.0,
                              origin=(-0.5, -0.5, -0.5), spacing=spacing)
    assert mesh.triangles.shape[0] > 100
    # All vertices near the sphere surface.
    d = np.linalg.norm(mesh.vertices, axis=1)
    assert np.abs(d - radius).max() < 2.5 / res, np.abs(d - radius).max()
    # Surface area close to 4*pi*r^2.
    v0 = mesh.vertices[mesh.triangles[:, 0]]
    v1 = mesh.vertices[mesh.triangles[:, 1]]
    v2 = mesh.vertices[mesh.triangles[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1).sum()
    true_area = 4.0 * np.pi * radius ** 2
    assert abs(area - true_area) / true_area < 0.05, (area, true_area)
    # Normals point outward (away from center).
    outward = np.sum(mesh.normals * mesh.vertices, axis=1)
    assert (outward > 0).mean() > 0.99


def test_watertight_closed_surface():
    """Every edge of a closed isosurface is shared by exactly 2 triangles."""
    mesh = extract_isosurface(_sphere_field(16, 0.3), iso=0.0)
    t = mesh.triangles
    edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), np.unique(counts)


def test_empty_field():
    mesh = extract_isosurface(np.zeros((4, 4, 4), np.float32), iso=0.5)
    assert mesh.triangles.shape[0] == 0


def test_isosurface_renders():
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.surface import render_surface_image

    res = 16
    mesh = extract_isosurface(
        _sphere_field(res, 0.35), iso=0.0, origin=(-0.5, -0.5, -0.5),
        spacing=np.full(3, 1.0 / (res - 1), np.float32),
    )
    # Resolution chosen so extracted triangles are >= 1 px (sub-pixel
    # triangles legitimately miss pixel centers in a point-sampled raster).
    cam = Camera(position=(0.0, 0.2, 1.2), width=96, height=64)
    img = render_surface_image(
        mesh, cam,
        settings=RasterSettings(width=96, height=64, tile_w=16, tile_h=8,
                                span_x=3, span_y=3),
    )
    assert np.isfinite(img).all()
    fg = (img[..., :3] < 0.999).any(-1)
    # The projected sphere disc is covered nearly solidly (isolated pixel
    # cracks from skinny tetrahedral triangles are acceptable).
    yy, xx = np.mgrid[0:64, 0:96]
    disc = (yy - 32.0) ** 2 + (xx - 48.0) ** 2 < 14.0 ** 2
    assert fg[disc].mean() > 0.9, fg[disc].mean()
