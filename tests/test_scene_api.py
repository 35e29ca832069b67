"""Scene API tests: LineData caching/filters, stress model, settings,
renderer registry, replay scripting."""

import numpy as np
import pytest

from linevis_tpu.core.settings import SettingsMap
from linevis_tpu.core.trajectories import RaggedTrajectories, pad_trajectories
from linevis_tpu.scene.filters import LineLengthFilter, MaxLineAttributeFilter
from linevis_tpu.scene.line_data import LineData, LineDataFlow
from linevis_tpu.scene.line_data_stress import LineDataStress


def _traj(rng, num_lines=6):
    positions, attributes = [], []
    for i in range(num_lines):
        n = 4 + 4 * i
        t = np.linspace(0, 1, n, dtype=np.float32)
        pos = np.stack([t * (0.1 + 0.1 * i), t * 0.2, 0 * t], -1)
        positions.append(pos)
        attributes.append(np.stack([t * (i + 1) / num_lines]))
    return pad_trajectories(RaggedTrajectories(positions, attributes, ["a"]))


def test_line_data_stats_and_cache(rng):
    ld = LineData(_traj(rng), name="test")
    assert ld.num_lines == 6
    lo, hi = ld.get_attribute_range()
    assert 0.0 <= lo < hi <= 1.0
    scene1 = ld.get_capsule_scene()
    scene2 = ld.get_capsule_scene()
    assert scene1 is scene2  # cached
    ld.set_line_width(0.01)
    scene3 = ld.get_capsule_scene()
    assert scene3 is not scene1  # invalidated
    assert scene3.radius == pytest.approx(0.005)


def test_filters(rng):
    ld = LineData(_traj(rng))
    ld.add_filter(LineLengthFilter(min_length=0.3))
    mask = ld.get_filter_mask()
    assert mask.sum() < 6 and mask.sum() > 0
    ld.clear_filters()
    ld.add_filter(MaxLineAttributeFilter(0, lo=0.5, hi=1.0))
    mask2 = ld.get_filter_mask()
    # lines with max attr >= 0.5: attr max = (i+1)/6 -> i >= 2
    assert mask2.tolist() == [False, False, True, True, True, True]
    # Filtered points are excluded from the render representation.
    sc = ld.get_capsule_scene()
    assert int(np.asarray(sc.mask).sum()) < ld.trajectories.segment_mask().sum()


def test_settings_map():
    s = SettingsMap({"line_width": 0.004, "attribute": "a", "flag": True})
    assert s.get_float("line_width") == pytest.approx(0.004)
    assert s.get_bool("flag")
    assert s.get_value("attribute") == "a"
    s.add_key_value("v", "(1, 2, 3)")
    assert s.get_vec("v") == (1.0, 2.0, 3.0)


def test_line_data_settings(rng):
    ld = LineData(_traj(rng))
    ld.set_new_settings(SettingsMap({"line_width": 0.008}))
    assert ld.line_width == pytest.approx(0.008)


def test_stress_model(tmp_path):
    # Two PS blocks via the v1 .dat loader.
    def block(name, y):
        pos = f"0 0 {y} 1 0 {y}"
        ps = " ".join(str(v) for v in ([3.0, 1, 0, 0, 2.0, 0, 1, 0, 1.0, 0, 0, 1] * 2))
        return f"{name} 1\n2\n{pos}\n{ps}\n7.0 8.0\n"

    dat = tmp_path / "psl.dat"
    dat.write_text(block("major", 0.0) + block("minor", 0.5))
    lds = LineDataStress.load_from_dat([str(dat)])
    assert len(lds.trajectories_ps) == 2
    assert lds.num_lines == 2
    # Disable one direction -> merged set shrinks.
    lds.set_used_ps_directions([True, False])
    assert int(lds.trajectories.mask.any(axis=1).sum()) == 1
    lds.set_used_ps_directions([True, True])
    # Hierarchy slider at 1.1 filters everything in that direction.
    lds.set_hierarchy_slider(0, 1.1)
    assert int(lds.trajectories.mask.any(axis=1).sum()) == 1
    colors = lds.get_line_ps_colors()
    assert colors.shape == (2, 3)


def test_renderer_registry_and_fallback(rng):
    import warnings
    from linevis_tpu.render.renderer import create_renderer, RENDERING_MODE_ALL

    assert "Opaque" in RENDERING_MODE_ALL
    r = create_renderer("Opaque")
    assert r.name == "Opaque"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r2 = create_renderer("Voxel Ray Casting (Lines)")
        assert r2.name == "Opaque"
        assert len(w) == 1


def test_opaque_tube_geometry_setting(rng):
    """tubeGeometry = capsule | triangle selects the raster geometry; the
    triangle path is the reference's 8-subdiv tube (Tubes.hpp:40)."""
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.renderer import create_renderer

    ld = LineData(_traj(rng))
    ld.set_line_width(0.05)
    cam = Camera(position=(0.0, 0.1, 1.2), width=64, height=32)

    r = create_renderer("Opaque")
    r.set_line_data(ld)
    assert r.tube_geometry == "capsule"
    img_cap = r.render(cam)
    assert img_cap.shape == (32, 64, 4) and np.isfinite(img_cap).all()

    r.set_new_settings(SettingsMap({"tubeGeometry": "triangle"}))
    assert r.tube_geometry == "triangle"
    img_tri = r.render(cam)
    assert img_tri.shape == (32, 64, 4) and np.isfinite(img_tri).all()
    # Both draw the same lines: foreground masks mostly agree.
    fg_c = np.abs(img_cap[..., :3] - 1.0).max(-1) > 1e-4
    fg_t = np.abs(img_tri[..., :3] - 1.0).max(-1) > 1e-4
    assert fg_t.any()
    assert (fg_c ^ fg_t).mean() < 0.08

    # 'prism' = same triangle-8 geometry through the analytic prism
    # kernel: must agree with the exact triangle path pixel-for-pixel up
    # to edge slivers.
    r.set_new_settings(SettingsMap({"tubeGeometry": "prism"}))
    assert r.tube_geometry == "prism"
    img_pr = r.render(cam)
    assert img_pr.shape == (32, 64, 4) and np.isfinite(img_pr).all()
    fg_p = np.abs(img_pr[..., :3] - 1.0).max(-1) > 1e-4
    assert fg_p.any()
    assert (fg_p ^ fg_t).mean() < 0.03
    assert np.abs(img_pr - img_tri).mean() < 6e-3

    with pytest.raises(ValueError):
        r.set_new_settings(SettingsMap({"tubeGeometry": "dodecahedron"}))


def test_replay_script(rng, tmp_path):
    from linevis_tpu.automation.replay import ReplayWidget
    from linevis_tpu.render.camera import Camera

    ld = LineData(_traj(rng))
    rendered = []

    widget = ReplayWidget(lambda name: ld, fps=4.0, output_dir=str(tmp_path))
    widget.frame_callback = lambda i, img: rendered.append(img.shape)
    widget.load_script(
        """
g.set_dataset("test")
g.set_renderer("Opaque")
g.set_dataset_settings({"line_width": 0.01})
g.set_camera_position(0.0, 0.0, 1.5)
g.set_duration(0.5)
g.set_camera_position(0.3, 0.1, 1.4)
g.set_duration(0.5)
g.save_screenshot("final.png")
"""
    )
    n = widget.run(width=64, height=32)
    assert n >= 3
    assert (tmp_path / "final.png").exists()
    assert ld.line_width == 0.01


def test_perf_measurer(rng, tmp_path):
    from linevis_tpu.automation.perf import AutomaticPerformanceMeasurer, InternalState

    ld = LineData(_traj(rng))
    states = [
        InternalState(name="opaque_small", dataset="d", rendering_mode="Opaque",
                      window_size=(64, 32)),
    ]
    csv_path = str(tmp_path / "perf.csv")
    m = AutomaticPerformanceMeasurer(
        states, lambda name: ld, csv_path=csv_path, flight_seconds=0.4,
        fps_target=5.0,
    )
    rows = m.run()
    assert len(rows) == 1
    assert rows[0]["Average FPS"] > 0
    import csv as _csv

    with open(csv_path) as f:
        rd = list(_csv.DictReader(f))
    assert rd[0]["State Name"] == "opaque_small"


def test_frame_profiler_and_trace(tmp_path):
    import numpy as np
    import jax.numpy as jnp

    from linevis_tpu.automation.profiling import FrameProfiler, trace

    prof = FrameProfiler()
    x = jnp.ones((128, 128))
    for _ in range(2):
        with prof.pass_("matmul", force=None):
            y = x @ x
        with prof.pass_("sum", force=y):
            s = jnp.sum(y)
        prof.next_frame()
    assert prof.frame == 2
    summ = prof.summary()
    assert set(summ) == {"matmul", "sum"}
    csv_path = str(tmp_path / "passes.csv")
    prof.write_csv(csv_path)
    assert open(csv_path).read().count("matmul") == 2

    with trace(str(tmp_path / "jaxtrace")):
        float(jnp.sum(x @ x))
    import os
    assert any(os.scandir(str(tmp_path / "jaxtrace")))


def test_load_line_data_factory(tmp_path):
    """MainApp::loadLineDataSet dispatch: flow .obj, stress .dat with
    degenerate points, triangle-mesh surface."""
    import numpy as np

    from linevis_tpu.loaders.dataset_list import (
        DATA_SET_TYPE_STRESS_LINES,
        DataSetInformation,
    )
    from linevis_tpu.scene.factory import load_line_data
    from linevis_tpu.scene.line_data import LineDataFlow
    from linevis_tpu.scene.line_data_stress import LineDataStress
    from linevis_tpu.scene.triangle_mesh_data import TriangleMeshData

    # Flow .obj (line format)
    obj = tmp_path / "lines.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 2 0 0\n"
        "vt 0.1\nvt 0.5\nvt 0.9\n"
        "l 1 2 3\n"
    )
    ld = load_line_data(str(obj))
    assert isinstance(ld, LineDataFlow)
    assert ld.num_lines == 1

    # Stress v3 with degenerate points
    from examples.render_stress_bands import synth_v3_blocks
    from linevis_tpu.loaders.stress_dat import write_stress_trajectories_dat_v3

    blocks = synth_v3_blocks(np.random.default_rng(0), lines_per_ps=2, n=6)
    dat = tmp_path / "psl.dat"
    write_stress_trajectories_dat_v3(str(dat), blocks, None)
    dp = tmp_path / "degen.dat"
    dp.write_text("2\n0.1 0.2 0.3\n0.4 0.5 0.6\n")
    info = DataSetInformation(
        type=DATA_SET_TYPE_STRESS_LINES, filenames=[dat.name], version=3,
        degenerate_points_filename=dp.name, line_width=0.01,
        name="synthetic",
    )
    lds = load_line_data(info, base_dir=str(tmp_path))
    assert isinstance(lds, LineDataStress)
    assert lds.degenerate_points.shape == (2, 3)
    assert lds.line_width == 0.01

    # Surface .obj (face format)
    surf = tmp_path / "tri.obj"
    surf.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    tm = load_line_data(str(surf))
    assert isinstance(tm, TriangleMeshData)
    assert tm.num_triangles == 1


def test_perf_measurer_new_columns_and_sweep(rng, tmp_path):
    """DC/buffer columns present; get_test_modes_oit builds the sweep."""
    from linevis_tpu.automation.perf import (
        AutomaticPerformanceMeasurer,
        get_test_modes,
        get_test_modes_oit,
    )

    sweep = get_test_modes_oit("d", window_size=(64, 32))
    names = [s.name for s in sweep]
    assert "MBOIT 6 Power Moments" in names
    assert "Depth Peeling" in names
    assert len(get_test_modes("d")) == len(sweep) + 2

    ld = LineData(_traj(rng))
    csv_path = str(tmp_path / "perf2.csv")
    m = AutomaticPerformanceMeasurer(
        sweep[:2], lambda name: ld, csv_path=csv_path, flight_seconds=0.4,
        fps_target=5.0,
    )
    rows = m.run()
    assert len(rows) == 2
    assert rows[0]["Max Depth Complexity"] >= 0
    assert rows[0]["Dataset Buffer Size (GiB)"] > 0
    pf = str(tmp_path / "per_frame.csv")
    m.write_per_frame_csv(pf)
    assert open(pf).read().count("Opaque") >= 1
