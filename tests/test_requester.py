"""Async requesters (LineDataRequester.hpp:40-56 mailbox semantics)."""

import os
import tempfile
import time

import numpy as np

from linevis_tpu.scene.requester import (
    LineDataRequester,
    StreamlineTracingRequester,
)


def _write_obj_lines(path):
    with open(path, "w") as f:
        for i in range(6):
            f.write(f"v {i * 0.1} 0 0\n")
            f.write(f"vt {i * 0.1}\n")
        f.write("l 1 2 3\n")
        f.write("l 4 5 6\n")


def test_line_data_requester_loads_async():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "lines.obj")
        _write_obj_lines(path)
        req = LineDataRequester()
        req.queue_request([path])
        req.join()
        for _ in range(100):
            data = req.get_loaded_data()
            if data is not None:
                break
            time.sleep(0.01)
        assert data is not None
        assert data.trajectories.positions.shape[0] == 2
        # Reply slot is consumed.
        assert req.get_loaded_data() is None


def test_requester_error_propagates():
    req = LineDataRequester()
    req.queue_request(["/nonexistent/definitely_missing.obj"])
    req.join()
    err = None
    for _ in range(200):
        try:
            data = req.get_loaded_data()
        except Exception as exc:
            err = exc
            break
        if data is not None:
            break
        time.sleep(0.01)
    assert err is not None


def test_streamline_requester_traces():
    from linevis_tpu.trace.fields import tornado_velocity
    from linevis_tpu.trace.streamline import StreamlineTracingSettings

    req = StreamlineTracingRequester()
    req.queue_request(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=8, max_steps=16, dt=0.01),
    )
    req.join(timeout=120)
    traj = None
    for _ in range(500):
        traj = req.get_traced_lines()
        if traj is not None:
            break
        time.sleep(0.02)
    assert traj is not None
    assert traj.positions.shape[0] == 8
