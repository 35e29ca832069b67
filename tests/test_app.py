"""Interactive viewer app: render path + HTTP surface (CPU)."""

import json
import threading
import time
import urllib.request

import numpy as np


def _tiny_line_data():
    from linevis_tpu.core.trajectories import (
        normalize_attributes,
        normalize_trajectories,
    )
    from linevis_tpu.scene.line_data import LineData
    from linevis_tpu.trace.fields import tornado_velocity
    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamlines,
    )

    traj = trace_streamlines(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=8, max_steps=30, dt=1.0 / 100),
    )
    traj = normalize_attributes(normalize_trajectories(traj))
    ld = LineData(traj)
    ld.set_line_width(0.01)
    return ld


def test_app_render_frame_and_png():
    from linevis_tpu.app import LineVisApp

    app = LineVisApp(_tiny_line_data(), width=64, height=32)
    img = app.render_frame(0.5, 0.2, 2.0)
    assert img.shape == (32, 64, 4)
    assert np.isfinite(img).all()
    png = app.frame_png(0.5, 0.2, 2.0)
    assert png[:4] == b"\x89PNG"
    # Renderer cache: same mode object reused.
    assert app._renderer("Opaque") is app._renderer("Opaque")


def test_app_http_surface():
    from linevis_tpu.app import LineVisApp, serve

    app = LineVisApp(_tiny_line_data(), width=64, height=32)
    port = 8961
    t = threading.Thread(target=serve, args=(app, port), daemon=True)
    t.start()
    page = None
    for _ in range(60):
        time.sleep(0.5)
        try:
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=5
            ).read()
            break
        except Exception:
            continue
    assert page is not None and b"linevis_tpu" in page
    modes = json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{port}/modes").read()
    )
    assert "Opaque" in modes and len(modes) >= 15
    png = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/frame?yaw=0.4&pitch=0.2&dist=2.0",
        timeout=120,
    ).read()
    assert png[:4] == b"\x89PNG"
