"""The five BASELINE.json reference configs as 1080p scene builders.

Each builder returns an (H, W, 4) float image rendered through the
public renderer registry — the same path a user drives.  These are the
benchmark configs (BASELINE.md "Reference configs"):

  1. Tornado opaque, 800x600
  2. Tornado PPLL OIT, 1920x1080
  3. Rayleigh-Benard-style convection RTAO, 4 spp, 1920x1080
     (the reference's RBC dataset is an external download; an analytic
     convection-roll field stands in, traced to streamlines)
  4. Femur-like PSL bands, MLAB and MBOIT, 1920x1080
  5. Tornado opacity optimization at a fixed camera-replay frame,
     1920x1080

Used by tests/test_golden_baseline.py (opt-in, real TPU) and
tests.golden_gen_baseline (golden regeneration).
"""

from __future__ import annotations

import os

import numpy as np

def _res(w, h):
    # LINEVIS_BASELINE_SCALE shrinks every config's resolution (CPU
    # smoke tests use ~0.05 so the full registry path runs in seconds).
    scale = float(os.environ.get("LINEVIS_BASELINE_SCALE", "1"))
    return (max(int(w * scale) // 16 * 16, 32),
            max(int(h * scale) // 16 * 16, 16))


_TORNADO = {}


def _tornado_line_data():
    if "ld" not in _TORNADO:
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
            StreamlineTracingSettings(num_seeds=512, max_steps=400,
                                      dt=1.0 / 150.0),
        )
        traj = normalize_attributes(normalize_trajectories(traj))
        ld = LineData(traj)
        ld.set_line_width(0.003)
        _TORNADO["ld"] = ld
    return _TORNADO["ld"]


def _camera(w, h, pos=(0.0, 0.1, 1.2)):
    from linevis_tpu.render.camera import Camera

    return Camera(position=pos, look_at_point=(0.0, 0.0, 0.0),
                  width=w, height=h)


def _registry(mode, ld, w, h, frames=1, settings=None):
    from linevis_tpu.core.settings import SettingsMap
    from linevis_tpu.render.renderer import create_renderer

    r = create_renderer(mode, SettingsMap(settings or {}))
    r.set_line_data(ld)
    cam = _camera(w, h)
    img = r.render(cam)
    for _ in range(frames - 1):
        img = r.render(cam)
    return img


def config1_tornado_opaque():
    return _registry("Opaque", _tornado_line_data(), *_res(800, 600))


def config2_tornado_ppll():
    return _registry("Per-Pixel Linked Lists", _tornado_line_data(),
                     *_res(1920, 1080), settings={"opacity": 0.3})


def _convection_line_data():
    """Analytic Rayleigh-Benard-style convection rolls -> streamlines."""
    import jax.numpy as jnp

    from linevis_tpu.core.trajectories import (
        normalize_attributes,
        normalize_trajectories,
    )
    from linevis_tpu.scene.line_data import LineData
    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamlines,
    )

    def convection(p, time=0.0):
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        k = 2.0 * np.pi
        vx = jnp.sin(k * x) * jnp.cos(k * y)
        vy = -jnp.cos(k * x) * jnp.sin(k * y)
        vz = 0.3 * jnp.sin(k * x) * jnp.sin(k * z)
        return jnp.stack([vx, vy, vz], axis=-1)

    traj = trace_streamlines(
        convection,
        StreamlineTracingSettings(num_seeds=256, max_steps=300,
                                  dt=1.0 / 120.0),
    )
    traj = normalize_attributes(normalize_trajectories(traj))
    ld = LineData(traj)
    ld.set_line_width(0.004)
    return ld


def config3_convection_rtao():
    # RTAO reference defaults: 4 samples/frame, accumulation (2 frames
    # here for a deterministic golden).
    return _registry("RTAO", _convection_line_data(),
                     *_res(1920, 1080), frames=2)


def _femur_line_data():
    import os
    import tempfile

    from examples.render_stress_bands import synth_v3_blocks
    from linevis_tpu.loaders.stress_dat import (
        write_stress_trajectories_dat_v3,
    )
    from linevis_tpu.scene.line_data_stress import LineDataStress

    blocks = synth_v3_blocks(np.random.default_rng(11))
    path = os.path.join(tempfile.gettempdir(), "baseline_psl_v3.dat")
    write_stress_trajectories_dat_v3(path, blocks)
    ld = LineDataStress.load_from_dat([path], version=3)
    ld.set_line_width(0.012)
    return ld


def config4_femur_mlab():
    return _registry("Multi-Layer Alpha Blending", _femur_line_data(),
                     *_res(1920, 1080), settings={"opacity": 0.45})


def config4b_femur_mboit():
    return _registry("Moment-Based OIT", _femur_line_data(),
                     *_res(1920, 1080), settings={"opacity": 0.45})


def config5_tornado_opacity_opt_replay():
    """Opacity optimization rendered at the end of a short camera
    flight (replay semantics: the 3rd frame of a circle path)."""
    from linevis_tpu.automation.camera_path import CameraPath
    from linevis_tpu.core.settings import SettingsMap
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.renderer import create_renderer

    ld = _tornado_line_data()
    r = create_renderer("Opacity Optimization", SettingsMap({}))
    r.set_line_data(ld)
    path = CameraPath.from_circle_path(ld.get_aabb())
    img = None
    for i in range(3):
        pos, look = path.camera_at(i / 16.0 * path.total_time)
        w, h = _res(1920, 1080)
        img = r.render(Camera(position=tuple(pos),
                              look_at_point=tuple(look),
                              width=w, height=h))
    return img


BASELINE_SCENES = {
    "cfg1_tornado_opaque_800x600": config1_tornado_opaque,
    "cfg2_tornado_ppll_1080p": config2_tornado_ppll,
    "cfg3_convection_rtao_1080p": config3_convection_rtao,
    "cfg4_femur_mlab_1080p": config4_femur_mlab,
    "cfg4b_femur_mboit_1080p": config4b_femur_mboit,
    "cfg5_tornado_opacityopt_1080p": config5_tornado_opacity_opt_replay,
}
