"""3D-TSV ZeroMQ requester: loopback protocol test with a fake tracer."""

import json
import threading

import numpy as np
import pytest

zmq = pytest.importorskip("zmq")

from linevis_tpu.automation.tsv_requester import (
    StressLineTracingRequester,
    StressLineTracingSettings,
)

PORT = 17981


def _fake_tsv_server(reply: dict, got: list):
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.REP)
    sock.setsockopt(zmq.LINGER, 0)
    sock.setsockopt(zmq.RCVTIMEO, 5000)
    sock.bind(f"tcp://127.0.0.1:{PORT}")
    try:
        msg = sock.recv_string()
        got.append(json.loads(msg))
        sock.send_string(json.dumps(reply))
    finally:
        sock.close(0)


def test_request_reply_roundtrip(tmp_path):
    from examples.render_stress_bands import synth_v3_blocks
    from linevis_tpu.loaders.stress_dat import write_stress_trajectories_dat_v3

    rng = np.random.default_rng(0)
    blocks = synth_v3_blocks(rng, lines_per_ps=2, n=8)
    dat = tmp_path / "tsv_result.dat"
    write_stress_trajectories_dat_v3(str(dat), blocks, None)

    got = []
    server = threading.Thread(
        target=_fake_tsv_server,
        args=({"fileName": ["tsv_result.dat"], "version": 3}, got),
    )
    server.start()

    req = StressLineTracingRequester(address="127.0.0.1", port=PORT,
                                     timeout_ms=5000)
    settings = StressLineTracingSettings(
        mesh_filename="femur.mesh", seed_strategy="Volume",
        trace_medium=False, max_angle_deviation=6.0,
    )
    req.queue_request(settings)
    reply = req.get_reply(timeout=10.0)
    server.join(timeout=10.0)
    req.join()

    # Request JSON carries the reference's keys.
    assert got, "server saw no request"
    r = got[0]
    assert r["fileName"] == "femur.mesh"
    assert r["seedStrategy"] == "Volume"
    assert r["selectedPrincipalStressField"] == [1, 3]
    assert r["lineDensCtrl"] == "default"
    assert r["maxAngleDevi"] == 6.0

    # Reply loads into LineDataStress through the stress loader.
    assert reply is not None and "error" not in reply
    ld = req.load_reply_line_data(reply, base_dir=str(tmp_path))
    assert len(ld.trajectories_ps) == 3
