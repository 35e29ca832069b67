"""Triangle-mesh datasets: loaders + surface raster path."""

import numpy as np
import pytest


def _cube_obj(path):
    """Unit cube .obj with quads (tests fan triangulation)."""
    v = [(-1,-1,-1),(1,-1,-1),(1,1,-1),(-1,1,-1),
         (-1,-1,1),(1,-1,1),(1,1,1),(-1,1,1)]
    faces = [(1,4,3,2),(5,6,7,8),(1,2,6,5),(3,4,8,7),(2,3,7,6),(1,5,8,4)]
    with open(path, "w") as f:
        for p in v:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for q in faces:
            f.write("f " + " ".join(map(str, q)) + "\n")


def test_obj_surface_loader(tmp_path):
    from linevis_tpu.loaders.mesh_loader import load_surface_mesh

    path = str(tmp_path / "cube.obj")
    _cube_obj(path)
    mesh = load_surface_mesh(path)
    assert mesh.vertices.shape == (8, 3)
    assert mesh.triangles.shape == (12, 3)
    # Smooth cube normals point diagonally outward.
    n = mesh.normals
    outward = np.sum(n * mesh.vertices, axis=1)
    assert (outward > 0).all()
    assert mesh.attributes.shape == (8,)
    assert np.isfinite(mesh.attributes).all()


def test_stl_roundtrip(tmp_path):
    import struct

    from linevis_tpu.loaders.mesh_loader import load_surface_mesh

    # One-triangle binary STL.
    tris = np.array([
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
        [[0, 0, 0], [0, 1, 0], [0, 0, 1]],
    ], np.float32)
    path = str(tmp_path / "two.stl")
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(np.zeros(3, np.float32).tobytes())
            f.write(t.astype("<f4").tobytes())
            f.write(struct.pack("<H", 0))
    mesh = load_surface_mesh(path)
    assert mesh.triangles.shape == (2, 3)
    assert mesh.vertices.shape[0] == 4  # welded shared vertices


def test_surface_render_cube(tmp_path):
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.scene.triangle_mesh_data import (
        TriangleMeshData,
        TriangleMeshRenderer,
    )

    path = str(tmp_path / "cube.obj")
    _cube_obj(path)
    data = TriangleMeshData.load_from_file(path)
    r = TriangleMeshRenderer()
    r.set_line_data(data)
    cam = Camera(position=(0.8, 0.6, 1.2), look_at_point=(0, 0, 0),
                 width=64, height=48)
    img = r.render(cam)
    assert img.shape == (48, 64, 4)
    assert np.isfinite(img).all()
    # The cube covers the image center; background at corners.
    fg = (img[..., :3] < 0.999).any(-1)
    assert fg[24, 32]
    assert not fg[0, 0]
    # Shaded: the lit faces differ in brightness (not flat).
    lum = img[..., :3].mean(-1)
    vals = lum[fg]
    assert vals.std() > 0.01


def test_stress_hull_surface_renders(tmp_path):
    """Simulation hull -> SurfaceMesh -> shaded hull pass
    (LineData.hpp:470-475 appearance)."""
    import dataclasses

    import numpy as np

    from examples.render_stress_bands import synth_v3_blocks
    from linevis_tpu.loaders.stress_dat import (
        SimulationMeshHull,
        write_stress_trajectories_dat_v3,
    )
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.surface import render_surface_image
    from linevis_tpu.scene.line_data_stress import LineDataStress

    rng = np.random.default_rng(1)
    blocks = synth_v3_blocks(rng, lines_per_ps=2, n=8)
    theta = np.linspace(0, 2 * np.pi, 9, dtype=np.float32)[:-1]
    ring = np.stack([0.5 * np.cos(theta), 0.5 * np.sin(theta),
                     0 * theta - 1], 1)
    top = ring.copy(); top[:, 2] = 1
    verts = np.concatenate([ring, top]).astype(np.float32)
    k = len(theta)
    tris = []
    for i in range(k):
        q = [i, (i + 1) % k, k + (i + 1) % k, k + i]
        tris += [[q[0], q[1], q[2]], [q[0], q[2], q[3]]]
    hull = SimulationMeshHull(vertices=verts,
                              triangles=np.array(tris, np.int32))
    path = str(tmp_path / "psl.dat")
    write_stress_trajectories_dat_v3(path, blocks, hull)
    ld = LineDataStress.load_from_dat([path], version=3)
    surf = ld.get_hull_surface()
    assert surf is not None
    assert np.isfinite(surf.normals).all()

    cam = Camera(position=(0.7, 0.4, 1.0), look_at_point=(0, 0, 0),
                 width=48, height=32)
    S = RasterSettings(
        width=48, height=32, tile_w=16, tile_h=8, span_x=3, span_y=4,
        tf_color=((0.0,) + LineDataStress.HULL_COLOR_LINEAR,
                  (1.0,) + LineDataStress.HULL_COLOR_LINEAR),
        tf_opacity=((0.0, LineDataStress.HULL_OPACITY),
                    (1.0, LineDataStress.HULL_OPACITY)),
    )
    img = render_surface_image(surf, cam, settings=S)
    assert np.isfinite(img).all()
    fg = img[..., 3] != 1.0  # alpha 0.3 where hull covers (bg alpha 1)
    assert fg.any()


def test_hex_mesh_boundary_extraction(tmp_path):
    """2x1x1 hex block: 10 boundary quads (20 tris), interior face culled."""
    import numpy as np

    from linevis_tpu.loaders.hex_mesh import load_hull_from_hex_mesh

    # 12 points: two unit cubes sharing a face.
    pts = []
    for x in (0, 1, 2):
        for z in (0, 1):
            for y in (0, 1):
                pts.append((x, y, z))
    pts = np.array(pts, np.float32)

    def pid(x, y, z):
        return x * 4 + z * 2 + y

    def hex_cell(x0):
        # VTK order: bottom quad CCW (z=0), then top quad (z=1)
        return [pid(x0, 0, 0), pid(x0 + 1, 0, 0), pid(x0 + 1, 1, 0),
                pid(x0, 1, 0), pid(x0, 0, 1), pid(x0 + 1, 0, 1),
                pid(x0 + 1, 1, 1), pid(x0, 1, 1)]

    cells = [hex_cell(0), hex_cell(1)]
    path = str(tmp_path / "block.vtk")
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\nhex\nASCII\n")
        f.write("DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {len(pts)} float\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
        f.write(f"CELLS 2 {2 * 9}\n")
        for c in cells:
            f.write("8 " + " ".join(map(str, c)) + "\n")
        f.write("CELL_TYPES 2\n12\n12\n")

    hull = load_hull_from_hex_mesh(path)
    # 2 hexes * 6 faces = 12; the shared face (2 uses) drops -> 10 quads.
    assert hull.triangles.shape[0] == 20
    # Watertight boundary: every edge shared by exactly 2 triangles.
    t = hull.triangles
    edges = np.sort(np.concatenate(
        [t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
