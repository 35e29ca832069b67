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
