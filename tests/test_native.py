"""Native loader library: parity with the pure-Python parsers."""

import numpy as np
import pytest

from linevis_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_parse_floats(tmp_path):
    f = tmp_path / "vals.dat"
    f.write_text("major 3\n1.5 2.5\n-3e-2\n")
    vals = native.parse_floats(str(f))
    np.testing.assert_allclose(vals, [3.0, 1.5, 2.5, -0.03])


def test_parse_obj_matches_python(tmp_path):
    obj = tmp_path / "lines.obj"
    obj.write_text(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 5\nv 1e20 0 0\n"
        "vt 0.1\nvt 0.2\nvt 0.3\nvt 0.4\nvt 0.5\n"
        "a speed\n"
        "g line0\n"
        "l 1 2 3\n"
        "l 3 4 5\n"
    )
    nat = native.parse_obj(str(obj))
    assert nat is not None
    positions, attributes, names = nat
    assert names == ["speed"]
    assert len(positions) == 2
    np.testing.assert_allclose(positions[0], [[0, 0, 0], [1, 0, 0], [1, 1, 0]])
    # invalid 1e20 vertex dropped
    np.testing.assert_allclose(positions[1], [[1, 1, 0], [0, 1, 5]])
    np.testing.assert_allclose(attributes[0][0], [0.1, 0.2, 0.3], rtol=1e-6)

    # Python fallback parity
    import linevis_tpu.loaders.obj_loader as ol

    nat_avail = native.available
    try:
        native.available = lambda: False
        ragged_py = ol.load_trajectories_from_obj(str(obj))
    finally:
        native.available = nat_avail
    ragged_nat = ol.load_trajectories_from_obj(str(obj))
    assert ragged_py.num_lines == ragged_nat.num_lines
    for i in range(ragged_py.num_lines):
        np.testing.assert_allclose(ragged_py.positions[i], ragged_nat.positions[i])
        np.testing.assert_allclose(ragged_py.attributes[i], ragged_nat.attributes[i])
