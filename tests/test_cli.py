"""`python -m linevis_tpu` CLI front end (reference Main.cpp:87-107 is a
GUI launcher with a `--perf` flag; headless, the same surface maps to the
datasets/render/replay/perf subcommands)."""

import json
import os

import numpy as np

from linevis_tpu.__main__ import main


def _write_obj(path, rng, n_lines=3, n_pts=6):
    lines = []
    with open(path, "w") as f:
        for _ in range(n_lines):
            pts = np.cumsum(rng.normal(0, 0.08, (n_pts, 3)), axis=0)
            pts -= pts.mean(axis=0)
            start = len(lines) + 1
            for p in pts:
                f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
                lines.append(p)
            for p in pts:
                f.write(f"vt {rng.uniform():.4f}\n")
            idx = " ".join(str(start + i) for i in range(n_pts))
            f.write(f"l {idx}\n")


def _registry(tmp_path, rng):
    obj = tmp_path / "mini.obj"
    _write_obj(str(obj), rng)
    reg = tmp_path / "datasets.json"
    reg.write_text(json.dumps({
        "datasets": [
            {"name": "mini", "filenames": "mini.obj", "linewidth": 0.01}
        ]
    }))
    return str(reg)


def test_cli_datasets_list(tmp_path, rng, capsys):
    reg = _registry(tmp_path, rng)
    assert main(["datasets", reg]) == 0
    out = capsys.readouterr().out
    assert "mini" in out and "mini.obj" in out


def test_cli_render_png(tmp_path, rng):
    reg = _registry(tmp_path, rng)
    out_png = str(tmp_path / "frame.png")
    rc = main([
        "render", "mini", "--datasets-json", reg,
        "--renderer", "Multi-Layer Alpha Blending",
        "--set", "opacity=0.5", "--set", "depth_cue_strength=0.2",
        "--camera-position", "0", "0.1", "1.3",
        "--width", "64", "--height", "32", "-o", out_png,
    ])
    assert rc == 0
    assert os.path.exists(out_png)
    from PIL import Image

    img = np.asarray(Image.open(out_png))
    assert img.shape[:2] == (32, 64)
    assert img.std() > 0  # not a constant frame


def test_cli_render_unknown_mode_falls_back(tmp_path, rng):
    reg = _registry(tmp_path, rng)
    out_png = str(tmp_path / "fb.png")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rc = main([
            "render", "mini", "--datasets-json", reg,
            "--renderer", "No Such Mode",
            "--width", "48", "--height", "32", "-o", out_png,
        ])
    assert rc == 0 and os.path.exists(out_png)


def test_cli_replay(tmp_path, rng, capsys):
    reg = _registry(tmp_path, rng)
    script = tmp_path / "replay.py"
    script.write_text(
        'g.set_dataset("mini")\n'
        'g.set_renderer("Opaque")\n'
        "g.set_camera_position(0.0, 0.0, 1.4)\n"
        "g.set_duration(0.4)\n"
        "g.set_camera_position(0.2, 0.1, 1.3)\n"
        'g.save_screenshot("cli_replay.png")\n'
    )
    rc = main([
        "replay", str(script), "--datasets-json", reg,
        "--fps", "5", "--output-dir", str(tmp_path),
        "--width", "48", "--height", "32",
    ])
    assert rc == 0
    assert (tmp_path / "cli_replay.png").exists()


def test_cli_perf_filtered(tmp_path, rng, capsys):
    reg = _registry(tmp_path, rng)
    csv_path = str(tmp_path / "perf.csv")
    rc = main([
        "perf", "mini", "--datasets-json", reg, "--oit",
        "--mode-filter", "Opaque", "--csv", csv_path,
        "--flight-seconds", "0.4", "--fps", "5",
        "--width", "48", "--height", "32",
    ])
    assert rc == 0
    import csv

    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert rows and rows[0]["State Name"] == "Opaque"
    assert float(rows[0]["Average FPS"]) > 0
