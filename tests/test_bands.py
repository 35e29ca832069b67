"""Stress .dat v2/v3 loaders, band geometry, and hull tests."""

import numpy as np
import pytest

from linevis_tpu.core.trajectories import RaggedTrajectories
from linevis_tpu.loaders.stress_dat import (
    RaggedStressTrajectories,
    SimulationMeshHull,
    _principal_stress_attrs,
    load_stress_trajectories_from_dat_v2,
    load_stress_trajectories_from_dat_v3,
    write_stress_trajectories_dat_v2,
    write_stress_trajectories_dat_v3,
)
from linevis_tpu.scene.line_data_stress import LineDataStress


def _make_block(rng, ps_index=0, num_lines=3, n=6, v3=False):
    block = RaggedStressTrajectories(
        trajectories=RaggedTrajectories([], [], []),
        ps_index=ps_index,
    )
    for li in range(num_lines):
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        block.trajectories.positions.append(pos)
        right = rng.normal(size=(n, 3)).astype(np.float32)
        right /= np.linalg.norm(right, axis=1, keepdims=True)
        block.band_points_left.append(-right)
        block.band_points_right.append(right)
        if v3:
            block.band_points_left_unsmoothed.append(-right * 1.1)
            block.band_points_right_unsmoothed.append(right * 1.1)
            attrs = rng.normal(size=(9, n)).astype(np.float32)
            attrs[1] = np.abs(attrs[0])
            block.trajectories.attributes.append(attrs)
            block.hierarchy_levels.append([0.1 * li, 0.2, 0.3, 0.4])
            block.appearance_orders.append(li)
            block.seed_positions.append(pos[0])
        else:
            block.trajectories.attributes.append(
                rng.normal(size=(1, n)).astype(np.float32)
            )
            block.hierarchy_levels.append([0.1 * li])
    return block


def test_v2_round_trip(tmp_path, rng):
    blocks = [_make_block(rng, 0), _make_block(rng, 2)]
    path = str(tmp_path / "test_v2.dat")
    write_stress_trajectories_dat_v2(path, blocks)
    ps_indices, loaded = load_stress_trajectories_from_dat_v2([path])
    assert ps_indices == [0, 2]
    assert len(loaded) == 2
    for orig, got in zip(blocks, loaded):
        for a, b in zip(orig.trajectories.positions, got.trajectories.positions):
            np.testing.assert_allclose(a, b, rtol=1e-5)
        for a, b in zip(orig.band_points_right, got.band_points_right):
            np.testing.assert_allclose(a, b, rtol=1e-5)
        for (la,), (lb,) in zip(
            orig.hierarchy_levels, got.hierarchy_levels
        ):
            assert abs(la - lb) < 1e-6


def test_v3_round_trip_with_hull(tmp_path, rng):
    blocks = [_make_block(rng, i, v3=True) for i in range(3)]
    hull = SimulationMeshHull(
        vertices=rng.normal(size=(8, 3)).astype(np.float32),
        triangles=np.array([[0, 1, 2], [4, 5, 6]], np.int32),
        mesh_type="cartesian",
    )
    path = str(tmp_path / "test_v3.dat")
    write_stress_trajectories_dat_v3(path, blocks, hull)
    ps_indices, loaded, got_hull = load_stress_trajectories_from_dat_v3([path])
    assert ps_indices == [0, 1, 2]
    assert got_hull is not None
    np.testing.assert_allclose(got_hull.vertices, hull.vertices, rtol=1e-5)
    np.testing.assert_array_equal(got_hull.triangles, hull.triangles)
    for orig, got in zip(blocks, loaded):
        # 13 attributes: 9 measured + 4 derived.
        assert got.trajectories.attributes[0].shape[0] == 13
        for a, b in zip(orig.trajectories.positions, got.trajectories.positions):
            np.testing.assert_allclose(a, b, rtol=1e-5)
        for a, b in zip(orig.band_points_right, got.band_points_right):
            np.testing.assert_allclose(a, b, rtol=1e-5)
        for a, b in zip(
            orig.band_points_right_unsmoothed, got.band_points_right_unsmoothed
        ):
            np.testing.assert_allclose(a, b, rtol=1e-4)
        assert got.appearance_orders == orig.appearance_orders
        # Measured attrs round trip (row 1 = |row 0| derived on load).
        for a, b in zip(
            orig.trajectories.attributes, got.trajectories.attributes
        ):
            np.testing.assert_allclose(a[0], b[0], rtol=1e-4)
            np.testing.assert_allclose(np.abs(a[0]), b[1], rtol=1e-4)
            np.testing.assert_allclose(a[2:9], b[2:9], rtol=1e-4)


def test_principal_stress_derivation(rng):
    """Derived eigenvalues diagonalize the tensor; degeneracy formula
    matches StressTrajectoriesDatLoader.cpp:64-69."""
    attrs9 = rng.normal(size=(9, 5)).astype(np.float32)
    out = _principal_stress_attrs(attrs9)
    major, medium, minor, deg = out
    assert (major >= medium).all() and (medium >= minor).all()
    xx, yy, zz, yz, zx, xy = (attrs9[i] for i in (3, 4, 5, 6, 7, 8))
    # Trace and determinant invariants.
    np.testing.assert_allclose(
        major + medium + minor, xx + yy + zz, rtol=1e-4, atol=1e-4
    )
    expect_deg = np.maximum(
        1.0 - np.abs((major - medium) / (major + medium)),
        1.0 - np.abs((minor - medium) / (minor + medium)),
    )
    np.testing.assert_allclose(deg, expect_deg, rtol=1e-4)


def test_band_mesh_cross_section():
    """Straight line, constant right vector: ellipse radii match."""
    from linevis_tpu.geometry.bands import build_band_tube_mesh

    P = 5
    pos = np.zeros((1, P, 3), np.float32)
    pos[0, :, 0] = np.linspace(0, 1, P)
    mask = np.ones((1, P), bool)
    attrs = np.zeros((1, P), np.float32)
    right = np.zeros((1, P, 3), np.float32)
    right[..., 1] = 1.0  # right = +y, tangent = +x -> normal = y×x = -z
    bw, thick = 0.1, 0.15
    mesh = build_band_tube_mesh(
        pos, mask, attrs, right, band_width=bw, min_band_thickness=thick,
        num_subdivisions=16,
    )
    verts = np.asarray(mesh.vertices).T.reshape(-1, 3)
    centers_x = verts[:, 0]
    off = verts - np.stack([centers_x, 0 * centers_x, 0 * centers_x], 1)
    # Wide axis along binormal = tangent × normal = x × (-z) = +y.
    assert abs(np.abs(off[:, 1]).max() - bw / 2) < 1e-6
    # Thin axis along normal (-z): radius = bw/2 * thick.
    assert abs(np.abs(off[:, 2]).max() - bw / 2 * thick) < 1e-6


def test_hyperstreamline_radii():
    from linevis_tpu.geometry.bands import build_principal_stress_tube_mesh

    P = 4
    pos = np.zeros((1, P, 3), np.float32)
    pos[0, :, 0] = np.linspace(0, 1, P)
    mask = np.ones((1, P), bool)
    attrs = np.zeros((1, P), np.float32)
    right = np.zeros((1, P, 3), np.float32)
    right[..., 1] = 1.0
    major = np.full((1, P), 2.0, np.float32)
    medium = np.full((1, P), 0.5, np.float32)
    minor = np.full((1, P), 0.25, np.float32)
    bw = 0.1
    # Major line (ps=0): stressX=medium, stressZ=minor.
    mesh = build_principal_stress_tube_mesh(
        pos, mask, attrs, right, np.zeros((1,), np.int32),
        major, medium, minor, band_width=bw, hyperstreamline=True,
        num_subdivisions=16,
    )
    verts = np.asarray(mesh.vertices).T.reshape(-1, 3)
    rn_expect = bw / 2 * 0.5  # |medium| along normal (-z)
    rb_expect = bw / 2 * 0.25  # |minor| along binormal (+y)
    assert abs(np.abs(verts[:, 2]).max() - rn_expect) < 1e-6
    assert abs(np.abs(verts[:, 1]).max() - rb_expect) < 1e-6


def test_line_data_stress_v3_end_to_end(tmp_path, rng):
    """Synthetic v3 file -> LineDataStress -> band mesh renders opaque."""
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.opaque import render_opaque_image
    from linevis_tpu.render.pipeline import RasterSettings

    blocks = [_make_block(rng, i, num_lines=2, n=8, v3=True) for i in range(2)]
    hull = SimulationMeshHull(
        vertices=np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
        ),
        triangles=np.array([[0, 1, 2], [1, 3, 2]], np.int32),
    )
    path = str(tmp_path / "femur_like_v3.dat")
    write_stress_trajectories_dat_v3(path, blocks, hull)
    data = LineDataStress.load_from_dat([path], version=3)
    assert data.use_bands
    assert data.hull is not None
    assert len(data.attribute_names) == 13
    # Hierarchy filtering still works.
    data.set_hierarchy_slider(0, 0.05)
    for mode in ("RIBBONS", "EIGENVALUE_RATIO", "HYPERSTREAMLINES"):
        data.set_band_render_mode(mode)
        mesh = data.get_band_tube_mesh(num_subdivisions=4)
        assert bool(np.isfinite(np.asarray(mesh.vertices)).all())
    cam = Camera(position=(0.0, 0.2, 1.4), width=32, height=16)
    img = render_opaque_image(
        data.get_band_tube_mesh(num_subdivisions=4), cam,
        settings=RasterSettings(width=32, height=16, tile_w=16, tile_h=8,
                                chunk=8),
    )
    assert np.isfinite(img).all()


def test_degenerate_point_spheres_render():
    """Degenerate points render as spheres at the TF hot end
    (OpaqueLineRenderer degeneratePointsRasterPass role)."""
    import numpy as np

    from linevis_tpu.core.trajectories import (
        RaggedTrajectories, pad_trajectories,
    )
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.tube_raster import render_tubes_image
    from linevis_tpu.scene.line_data_stress import LineDataStress

    line = np.zeros((5, 3), np.float32)
    line[:, 0] = np.linspace(-0.4, 0.4, 5)
    traj = pad_trajectories(RaggedTrajectories(
        positions=[line], attributes=[np.full((1, 5), 0.2, np.float32)],
        attribute_names=["a"],
    ))
    ld = LineDataStress(
        trajectories_ps=[traj], ps_indices=[0],
        degenerate_points=np.array([[0.0, 0.25, 0.0]], np.float32),
    )
    ld.set_line_width(0.12)
    cam = Camera(position=(0.0, 0.0, 1.4), width=64, height=48)
    S = RasterSettings(width=64, height=48, tile_w=16, tile_h=8,
                       span_x=3, span_y=3)

    base = render_tubes_image(ld.get_capsule_scene(), cam, settings=S)
    ld.set_show_degenerate_points(True)
    with_pts = render_tubes_image(ld.get_capsule_scene(), cam, settings=S)

    fg_base = (base[..., :3] < 0.999).any(-1)
    fg_pts = (with_pts[..., :3] < 0.999).any(-1)
    # The sphere adds coverage above the line (y=0.25 -> upper image half).
    added = fg_pts & ~fg_base
    assert added.sum() > 10, added.sum()
    ys, xs = np.nonzero(added)
    assert ys.mean() < 24  # upper half (y image axis points down)
    # Hot-end color: red channel dominates in the added region.
    reds = with_pts[added]
    assert (reds[:, 0] > reds[:, 2]).mean() > 0.8


def test_hierarchy_mapping_curve_opacity():
    """Editable opacity(hierarchy) curve fades low-hierarchy lines in the
    transparent path (StressLineHierarchyMappingWidget role)."""
    import numpy as np
    import jax.numpy as jnp

    from linevis_tpu.core.trajectories import (
        RaggedTrajectories, pad_trajectories,
    )
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.oit import render_tubes_mlab
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.tube_raster import _proj_constants
    from linevis_tpu.scene.line_data_stress import LineDataStress

    # Two parallel lines, hierarchy levels 0.1 (should fade) and 0.9.
    lines = []
    for y in (-0.15, 0.15):
        ln = np.zeros((4, 3), np.float32)
        ln[:, 0] = np.linspace(-0.4, 0.4, 4)
        ln[:, 1] = y
        lines.append(ln)
    traj = pad_trajectories(RaggedTrajectories(
        positions=lines,
        attributes=[np.full((1, 4), 0.5, np.float32)] * 2,
        attribute_names=["a"],
    ))
    hier = np.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]], np.float32)
    ld = LineDataStress(
        trajectories_ps=[traj], ps_indices=[0],
        hierarchy_levels_ps=[hier],
    )
    ld.set_line_width(0.1)
    ld.set_hierarchy_mapping_curve(0, [(0.0, 0.0), (1.0, 1.0)])

    ops = ld.get_line_hierarchy_opacities()
    np.testing.assert_allclose(ops, [0.1, 0.9], atol=1e-6)

    cam = Camera(position=(0.0, 0.0, 1.4), width=32, height=16)
    S = RasterSettings(width=32, height=16, tile_w=16, tile_h=8,
                       span_x=3, span_y=3, chunk=8)
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    ab = jnp.asarray(_proj_constants(cam))
    img = np.asarray(render_tubes_mlab(
        ld.get_capsule_scene(), vp, cp, ab, S, K=4, opacity=1.0,
        seg_alpha=jnp.asarray(ld.get_segment_opacity_rows()),
    ))
    # Alpha channel: the high-hierarchy line (y=0.15 -> upper half) is far
    # more opaque than the faded one.
    a = img[3]
    upper = a[: 8].max()   # y=+0.15 projects to the upper image half
    lower = a[8:].max()
    assert upper > 0.75, upper
    assert lower < 0.35, lower
