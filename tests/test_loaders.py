"""Loader round-trip tests for .obj, .binlines, stress .dat, datasets.json."""

import json
import os

import numpy as np

from linevis_tpu.core.trajectories import RaggedTrajectories
from linevis_tpu.loaders.binlines import (
    BinLinesData,
    load_trajectories_from_binlines,
    save_trajectories_as_binlines,
)
from linevis_tpu.loaders.dataset_list import load_dataset_list
from linevis_tpu.loaders.flow_file import load_flow_trajectories_from_file
from linevis_tpu.loaders.obj_loader import load_trajectories_from_obj
from linevis_tpu.loaders.stress_dat import load_stress_trajectories_from_dat_v1


def test_obj_loader(tmp_path):
    obj = tmp_path / "lines.obj"
    obj.write_text(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 5\n"
        "vt 0.1\nvt 0.2\nvt 0.3\nvt 0.4\n"
        "a speed\n"
        "g line0\n"
        "l 1 2 3\n"
        "l 3 4\n"
    )
    ragged = load_trajectories_from_obj(str(obj))
    assert ragged.num_lines == 2
    assert ragged.attribute_names == ["speed"]
    np.testing.assert_allclose(
        ragged.positions[0], [[0, 0, 0], [1, 0, 0], [1, 1, 0]]
    )
    np.testing.assert_allclose(ragged.attributes[0][0], [0.1, 0.2, 0.3], rtol=1e-6)
    np.testing.assert_allclose(ragged.positions[1], [[1, 1, 0], [0, 1, 5]])


def test_obj_invalid_points_dropped(tmp_path):
    obj = tmp_path / "inv.obj"
    obj.write_text("v 0 0 0\nv 1e20 0 0\nv 1 1 1\nl 1 2 3\n")
    ragged = load_trajectories_from_obj(str(obj))
    assert ragged.positions[0].shape[0] == 2


def test_binlines_roundtrip(tmp_path, rng):
    positions = [rng.normal(size=(n, 3)).astype(np.float32) for n in (5, 9)]
    attributes = [rng.normal(size=(2, n)).astype(np.float32) for n in (5, 9)]
    data = BinLinesData(
        trajectories=RaggedTrajectories(positions, attributes, ["u", "v"]),
        vertices_normalized=True,
    )
    path = str(tmp_path / "t.binlines")
    save_trajectories_as_binlines(path, data)
    loaded = load_trajectories_from_binlines(path)
    assert loaded.vertices_normalized
    assert loaded.trajectories.attribute_names == ["u", "v"]
    for i in range(2):
        np.testing.assert_allclose(loaded.trajectories.positions[i], positions[i])
        np.testing.assert_allclose(loaded.trajectories.attributes[i], attributes[i])


def test_flow_file_dispatch_and_normalize(tmp_path):
    obj = tmp_path / "lines.obj"
    obj.write_text(
        "v 0 0 0\nv 10 0 0\nv 10 10 0\n" "vt 5\nvt 10\nvt 15\n" "l 1 2 3\n"
    )
    traj = load_flow_trajectories_from_file(str(obj))
    assert traj.num_lines == 1
    # normalized to max-extent-1 box centered at origin
    valid = traj.positions[traj.mask]
    assert np.abs(valid).max() <= 0.5 + 1e-6
    a = traj.attributes[0, 0][traj.mask[0]]
    assert a.min() == 0.0 and a.max() == 1.0


def test_stress_dat_v1(tmp_path):
    # 1 PS block ("major"), 1 line with 2 points.
    dat = tmp_path / "psl.dat"
    pos = "0 0 0 1 0 0"
    ps = " ".join(
        str(v)
        for v in [
            3.0, 1, 0, 0, 2.0, 0, 1, 0, 1.0, 0, 0, 1,  # point 1
            3.5, 1, 0, 0, 2.5, 0, 1, 0, 1.5, 0, 0, 1,  # point 2
        ]
    )
    vm = "7.0 8.0"
    dat.write_text(f"major 1\n2\n{pos}\n{ps}\n{vm}\n")
    ps_indices, blocks = load_stress_trajectories_from_dat_v1([str(dat)])
    assert ps_indices == [0]
    b = blocks[0]
    assert b.trajectories.num_lines == 1
    np.testing.assert_allclose(b.trajectories.positions[0], [[0, 0, 0], [1, 0, 0]])
    np.testing.assert_allclose(b.major_ps[0], [3.0, 3.5])
    np.testing.assert_allclose(b.minor_ps_dir[0], [[0, 0, 1], [0, 0, 1]])
    # attr0 = von Mises, attr1 = |major| for major block
    np.testing.assert_allclose(b.trajectories.attributes[0][0], [7.0, 8.0])
    np.testing.assert_allclose(b.trajectories.attributes[0][1], [3.0, 3.5])


def test_dataset_list(tmp_path):
    doc = {
        "datasets": [
            {
                "type": "node",
                "name": "group",
                "children": [
                    {
                        "type": "flow",
                        "name": "tornado",
                        "filenames": "tornado.obj",
                        "linewidth": 0.004,
                        "attributes": ["speed"],
                    },
                    {
                        "type": "stress",
                        "name": "femur",
                        "filenames": ["a.dat", "b.dat"],
                        "version": 3,
                    },
                ],
            }
        ]
    }
    path = tmp_path / "datasets.json"
    path.write_text(json.dumps(doc))
    root = load_dataset_list(str(path))
    leaves = root.flat_leaves()
    assert [l.name for l in leaves] == ["tornado", "femur"]
    t = leaves[0]
    assert t.line_width == 0.004
    assert t.attribute_names == ["speed"]
    assert t.filenames[0].endswith("tornado.obj")
    f = leaves[1]
    # Stress default transform rotate(270°,1,0,0) applied
    assert f.transform is not None
    assert len(f.attribute_names) == 9  # v3 defaults


def test_netcdf_trajectories_roundtrip(tmp_path):
    """Write a CF-style trajectory .nc (scipy classic), read it back with
    the dispatcher (NetCdfLineLoader.cpp:360-465 semantics)."""
    import numpy as np
    from scipy.io import netcdf_file

    from linevis_tpu.loaders.netcdf_lines import load_trajectories_from_netcdf

    n_traj, n_time = 3, 10
    rng = np.random.default_rng(5)
    lon = rng.uniform(-0.4, 0.4, (1, n_traj, n_time)).astype(np.float32)
    lat = rng.uniform(-0.4, 0.4, (1, n_traj, n_time)).astype(np.float32)
    pressure = rng.uniform(100.0, 1000.0, (1, n_traj, n_time)).astype(np.float32)
    # Trajectory 1: invalid tail (truncates), trajectory 2: invalid lead.
    pressure[0, 1, 7:] = np.nan
    pressure[0, 2, :2] = -1.0
    extra = rng.uniform(0, 1, (1, n_traj, n_time)).astype(np.float32)

    path = str(tmp_path / "traj.nc")
    f = netcdf_file(path, "w")
    f.createDimension("ensemble", 1)
    f.createDimension("trajectory", n_traj)
    f.createDimension("time", n_time)
    dims = ("ensemble", "trajectory", "time")
    for name, data in [("lon", lon), ("lat", lat), ("pressure", pressure),
                       ("vorticity", extra)]:
        v = f.createVariable(name, "f", dims)
        v[:] = data
    f.variables["vorticity"].standard_name = "Vorticity"
    f.close()

    ragged = load_trajectories_from_netcdf(path)
    assert ragged.num_lines == 3
    assert [p.shape[0] for p in ragged.positions] == [10, 7, 8]
    # lat -> x, lon -> z.
    np.testing.assert_allclose(ragged.positions[0][:, 0], lat[0, 0], atol=1e-6)
    np.testing.assert_allclose(ragged.positions[0][:, 2], lon[0, 0], atol=1e-6)
    # y = normalized log pressure in [0, 1], decreasing with pressure.
    y = ragged.positions[0][:, 1]
    assert (y >= -1e-6).all() and (y <= 1 + 1e-6).all()
    order = np.argsort(pressure[0, 0])
    assert (np.diff(y[order]) <= 1e-6).all()
    # Attributes: pressure + vorticity (standard_name display).
    assert set(ragged.attribute_names) == {"pressure", "Vorticity"}
    vi = ragged.attribute_names.index("Vorticity")
    np.testing.assert_allclose(ragged.attributes[2][vi], extra[0, 2, 2:],
                               atol=1e-6)

    from linevis_tpu.loaders.flow_file import load_flow_trajectories_from_file
    traj = load_flow_trajectories_from_file(path)
    assert traj.num_lines == 3


def test_netcdf_grid_loader(tmp_path):
    """NetCDF vector-field grid for the streamline tracer
    (NetCdfLoader.cpp:113-360): u/v/w fields, 4-D time slicing, dim
    coordinates -> spacing, extra scalar with standard_name display."""
    import numpy as np
    from scipy.io import netcdf_file

    from linevis_tpu.loaders.grid_loader import (
        load_grid_file,
        load_netcdf_grid,
    )

    nz, ny, nx, nt = 4, 5, 6, 3
    rng = np.random.default_rng(9)
    u = rng.normal(size=(nt, nz, ny, nx)).astype(np.float32)
    v = rng.normal(size=(nt, nz, ny, nx)).astype(np.float32)
    w = rng.normal(size=(nt, nz, ny, nx)).astype(np.float32)
    temp = rng.normal(size=(nt, nz, ny, nx)).astype(np.float32)

    path = str(tmp_path / "wind.nc")
    f = netcdf_file(path, "w")
    f.createDimension("time", nt)
    f.createDimension("zdim", nz)
    f.createDimension("ydim", ny)
    f.createDimension("xdim", nx)
    dims = ("time", "zdim", "ydim", "xdim")
    for name, data in [("u", u), ("v", v), ("w", w), ("t", temp)]:
        var = f.createVariable(name, "f", dims)
        var[:] = data
    f.variables["t"].standard_name = "Temperature"
    # Coordinate variables: z twice as coarse as x/y.
    zc = f.createVariable("zdim", "f", ("zdim",))
    zc[:] = np.arange(nz, dtype=np.float32) * 2.0
    yc = f.createVariable("ydim", "f", ("ydim",))
    yc[:] = np.arange(ny, dtype=np.float32)
    xc = f.createVariable("xdim", "f", ("xdim",))
    xc[:] = np.arange(nx, dtype=np.float32)
    f.close()

    grid = load_netcdf_grid(path, time=1)
    assert grid.shape == (nz, ny, nx)
    np.testing.assert_allclose(grid.velocity[..., 0], u[1], atol=0)
    np.testing.assert_allclose(grid.velocity[..., 2], w[1], atol=0)
    assert "Temperature" in grid.scalars
    np.testing.assert_allclose(grid.scalars["Temperature"], temp[1], atol=0)
    # Spacing: dz twice dx, normalized so the max delta axis gets
    # cellStep = 1 / maxDimension (maxDim = nx - 1 = 5).
    np.testing.assert_allclose(grid.spacing[2], 0.2 * 2.0 / 2.0, atol=1e-6)
    np.testing.assert_allclose(grid.spacing[0], 0.2 * 1.0 / 2.0, atol=1e-6)

    # Dispatcher route + tracer smoke.
    grid2 = load_grid_file(path)
    assert grid2.shape == (nz, ny, nx)

    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamlines_grid,
    )

    traj = trace_streamlines_grid(
        grid.velocity,
        StreamlineTracingSettings(num_seeds=8, max_steps=16, dt=0.01),
    )
    assert traj.positions.shape[0] == 8


def test_vtk_structured_points_ascii_and_binary(tmp_path):
    """Write VTK legacy files both ways, load, trace streamlines."""
    import numpy as np

    from linevis_tpu.loaders.grid_loader import load_grid_file

    nx, ny, nz = 4, 3, 2
    n = nx * ny * nz
    rng = np.random.default_rng(0)
    vel = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    scal = rng.uniform(0, 1, n).astype(np.float32)

    ascii_path = str(tmp_path / "grid_ascii.vtk")
    with open(ascii_path, "w") as f:
        f.write("# vtk DataFile Version 3.0\ntest\nASCII\n")
        f.write("DATASET STRUCTURED_POINTS\n")
        f.write(f"DIMENSIONS {nx} {ny} {nz}\n")
        f.write("ORIGIN 0 0 0\nSPACING 1 1 1\n")
        f.write(f"POINT_DATA {n}\n")
        f.write("VECTORS velocity float\n")
        for v in vel:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        f.write("SCALARS vorticity float 1\nLOOKUP_TABLE default\n")
        for s in scal:
            f.write(f"{s}\n")

    bin_path = str(tmp_path / "grid_bin.vtk")
    with open(bin_path, "wb") as f:
        f.write(b"# vtk DataFile Version 3.0\ntest\nBINARY\n")
        f.write(b"DATASET STRUCTURED_POINTS\n")
        f.write(f"DIMENSIONS {nx} {ny} {nz}\n".encode())
        f.write(b"ORIGIN 0 0 0\nSPACING 1 1 1\n")
        f.write(f"POINT_DATA {n}\n".encode())
        f.write(b"VECTORS velocity float\n")
        f.write(vel.astype(">f4").tobytes())
        f.write(b"\nSCALARS vorticity float 1\nLOOKUP_TABLE default\n")
        f.write(scal.astype(">f4").tobytes())

    for path in (ascii_path, bin_path):
        g = load_grid_file(path)
        assert g.shape == (nz, ny, nx)
        np.testing.assert_allclose(
            g.velocity.reshape(-1, 3), vel, atol=1e-5, err_msg=path
        )
        np.testing.assert_allclose(
            g.scalars["vorticity"].reshape(-1), scal, atol=1e-5
        )

    # Feed the tracer end-to-end.
    import jax.numpy as jnp
    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings, trace_streamlines_grid,
    )
    g = load_grid_file(ascii_path)
    traj = trace_streamlines_grid(
        jnp.asarray(g.velocity),
        StreamlineTracingSettings(num_seeds=8, max_steps=16, dt=0.01),
    )
    assert traj.num_lines == 8


def test_dat_raw_grid(tmp_path):
    import numpy as np

    from linevis_tpu.loaders.grid_loader import load_grid_file

    nx, ny, nz = 5, 4, 3
    vel = np.random.default_rng(1).uniform(
        -1, 1, (nz, ny, nx, 3)
    ).astype(np.float32)
    (tmp_path / "field.raw").write_bytes(vel.tobytes())
    dat = tmp_path / "field.dat"
    dat.write_text(
        "ObjectFileName: field.raw\n"
        f"Resolution: {nx} {ny} {nz}\n"
        "Format: FLOAT3\n"
        "SliceThickness: 1 1 1\n"
    )
    g = load_grid_file(str(dat))
    assert g.shape == (nz, ny, nx)
    np.testing.assert_allclose(g.velocity, vel, atol=1e-6)


def test_amira_mesh_grid(tmp_path):
    import numpy as np

    from linevis_tpu.loaders.grid_loader import load_grid_file

    nx, ny, nz = 4, 3, 2
    vel = np.random.default_rng(2).uniform(
        -1, 1, (nz, ny, nx, 3)
    ).astype("<f4")
    path = tmp_path / "flow.am"
    header = (
        "# AmiraMesh BINARY-LITTLE-ENDIAN 2.1\n\n"
        f"define Lattice {nx} {ny} {nz}\n\n"
        "Parameters {\n"
        '    BoundingBox 0 3 0 2 0 1,\n'
        '    CoordType "uniform"\n'
        "}\n\n"
        "Lattice { float[3] Data } @1\n\n"
        "# Data section follows\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(b"@1\n")
        f.write(vel.tobytes())
    g = load_grid_file(str(path))
    assert g.shape == (nz, ny, nx)
    np.testing.assert_allclose(g.velocity, vel, atol=1e-6)
    np.testing.assert_allclose(g.origin, [0, 0, 0])
    np.testing.assert_allclose(g.spacing, [1, 1, 1])


def test_field_file_grid(tmp_path):
    import numpy as np

    from linevis_tpu.loaders.grid_loader import load_grid_file

    nx, ny, nz = 5, 2, 3
    vel = np.random.default_rng(3).uniform(
        -1, 1, (nz, ny, nx, 3)
    ).astype("<f4")
    path = tmp_path / "flow.field"
    with open(path, "wb") as f:
        f.write(np.asarray([nx, ny, nz, 3, 1, 0], "<u4").tobytes())
        f.write(vel.tobytes())
    g = load_grid_file(str(path))
    assert g.shape == (nz, ny, nx)
    np.testing.assert_allclose(g.velocity, vel, atol=1e-6)


def test_vtk_xml_grid_ascii_and_base64(tmp_path):
    import base64

    import numpy as np

    from linevis_tpu.loaders.grid_loader import load_grid_file

    nx, ny, nz = 3, 2, 2
    n = nx * ny * nz
    rng = np.random.default_rng(7)
    vel = rng.uniform(-1, 1, (n, 3)).astype("<f4")
    scal = rng.uniform(0, 1, n).astype("<f4")

    ascii_vals = "\n".join(" ".join(map(str, v)) for v in vel)
    blob = np.asarray([vel.nbytes], "<u4").tobytes() + vel.tobytes()
    b64 = base64.b64encode(blob).decode()

    for fmt, vec_xml in (
        ("ascii", f'<DataArray type="Float32" Name="velocity" '
                  f'NumberOfComponents="3" format="ascii">{ascii_vals}'
                  f'</DataArray>'),
        ("binary", f'<DataArray type="Float32" Name="velocity" '
                   f'NumberOfComponents="3" format="binary">{b64}'
                   f'</DataArray>'),
    ):
        path = tmp_path / f"grid_{fmt}.vti"
        path.write_text(
            '<?xml version="1.0"?>\n'
            '<VTKFile type="ImageData" version="1.0" '
            'byte_order="LittleEndian" header_type="UInt32">\n'
            f'<ImageData WholeExtent="0 {nx-1} 0 {ny-1} 0 {nz-1}" '
            'Origin="0 0 0" Spacing="0.5 0.5 0.5">\n'
            f'<Piece Extent="0 {nx-1} 0 {ny-1} 0 {nz-1}">\n'
            "<PointData>\n"
            f"{vec_xml}\n"
            '<DataArray type="Float32" Name="mag" format="ascii">'
            + " ".join(map(str, scal)) + "</DataArray>\n"
            "</PointData>\n</Piece>\n</ImageData>\n</VTKFile>\n"
        )
        g = load_grid_file(str(path))
        assert g.shape == (nz, ny, nx), fmt
        np.testing.assert_allclose(
            g.velocity.reshape(-1, 3), vel, atol=1e-5, err_msg=fmt
        )
        np.testing.assert_allclose(g.scalars["mag"].reshape(-1), scal,
                                   atol=1e-5)
        np.testing.assert_allclose(g.spacing, [0.5, 0.5, 0.5])


def test_grib_loader_gated():
    """GRIB is dependency-gated with a clear message (reference gates its
    GribLoader on ecCodes likewise)."""
    import pytest

    from linevis_tpu.loaders.grid_loader import load_grid_file

    with pytest.raises((ImportError, NotImplementedError)) as ei:
        load_grid_file("/tmp/some.grib2")
    assert "eccodes" in str(ei.value) or "GRIB" in str(ei.value)
