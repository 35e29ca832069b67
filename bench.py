"""Benchmark driver: all five BASELINE configs on one TPU chip.

Prints JSON lines: {"metric", "value", "unit", "vs_baseline", ...extra}.
The PRIMARY metric line (tornado_tubes_1080p_device_fps) is printed and
flushed AS SOON as it is measured; each further config re-prints the full
merged record as a fresh line (the LAST line is the most complete), so a
driver timeout mid-run can never zero the record. Bars (BASELINE.json):
>= 30 FPS at 1080p on the Tornado and Femur configs; RTAO reports Mrays/s.

Configs (BASELINE.json `configs`, InternalState.cpp:460-570 sweep role):
  1. Tornado opaque 800x600                 -> cfg1_opaque_800x600_fps
  2. Tornado PPLL (bounded K=32) 1080p      -> cfg2_ppll_1080p_fps
  3. Convection RTAO 4 spp 1080p            -> cfg3_rtao_1080p_fps (+Mrays/s)
  4. Femur PSL MLAB + MBOIT 1080p           -> cfg4_femur_{mlab,mboit}_fps
  5. Tornado opacity-opt + camera flight    -> cfg5_opacityopt_1080p_fps
plus the headline tornado opaque/MLAB 1080p numbers, the prism
(triangle-8 parity geometry) 1080p number, an AA-cost split
(opaque_noaa), a roofline block, and end-to-end latency (sync +
pipelined).

Sections are ordered value-first and the optional extras (roofline,
e2e readback) are gated on a wall-clock budget
(LINEVIS_BENCH_BUDGET_S, default 1500 s) so the driver sees rc=0: a
section that would start past the budget is skipped and recorded in
`skipped_past_budget`.

Measurement protocol (mirrors AutomaticPerformanceMeasurer.cpp:230-279):
frames with DISTINCT cameras are chained in one jitted fori_loop with a
checksum accumulator (axon's lazy dispatcher dedupes identical work and
block_until_ready does not force) and ONE scalar readback; frame time =
(t_N - t_1) / (N - 1) over >= 3 reps. The chain length `n` is a TRACED
argument so each config compiles once, not once per length.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

record = {}

_T_START = time.time()
_BUDGET_S = float(os.environ.get("LINEVIS_BENCH_BUDGET_S", "1500"))


class _Skip(Exception):
    """Raised inside a section to skip it when past the budget."""


def gate(est_s: float, name: str) -> None:
    if not have_time(est_s, name):
        raise _Skip()


def have_time(est_s: float, name: str) -> bool:
    """True when a section estimated at `est_s` fits the budget."""
    left = _BUDGET_S - (time.time() - _T_START)
    if left >= est_s:
        return True
    record.setdefault("skipped_past_budget", []).append(
        {"section": name, "est_s": est_s, "left_s": round(left, 1)}
    )
    return False


def emit():
    print(json.dumps(record), flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    import jax.numpy as jnp
    from functools import partial

    from linevis_tpu.core.trajectories import (
        normalize_attributes,
        normalize_trajectories,
    )
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.oit import render_tubes_mlab, render_tubes_mboit
    from linevis_tpu.render.pipeline import RasterSettings
    from linevis_tpu.render.tube_raster import (
        _proj_constants,
        build_capsule_scene,
        prepare_capsule_frame,
        render_tubes,
    )
    from linevis_tpu.trace.fields import tornado_velocity
    from linevis_tpu.trace.streamline import (
        StreamlineTracingSettings,
        trace_streamlines,
    )

    W, H = 1920, 1080
    NMAX = 16

    traj = trace_streamlines(
        tornado_velocity,
        StreamlineTracingSettings(num_seeds=512, max_steps=400, dt=1.0 / 150.0),
    )
    traj = normalize_attributes(normalize_trajectories(traj))
    scene = build_capsule_scene(
        traj.positions, traj.mask, traj.attributes[:, 0], radius=0.0015
    )
    cam = Camera(position=(0.0, 0.1, 1.2), width=W, height=H)
    settings = RasterSettings(width=W, height=H, tile_w=32, tile_h=16)
    settings_oit = RasterSettings(width=W, height=H, tile_w=16, tile_h=8)
    ab = jnp.asarray(_proj_constants(cam))

    def cams(camera, salt=0.0, n=NMAX):
        vps, cps = [], []
        for i in range(n):
            c = camera.orbit(0.002 * (i + 1) + salt, 0.1, 1.2)
            vps.append(np.asarray(c.view_projection_matrix()))
            cps.append(np.asarray(c.position, np.float32))
        return jnp.asarray(np.stack(vps)), jnp.asarray(np.stack(cps))

    def make_chain(frame_fn):
        """One jitted chain with a TRACED length n (single compile)."""

        @jax.jit
        def run(vps, cps, n):
            def body(i, acc):
                img = frame_fn(vps[i], cps[i])
                return acc + jnp.sum(img[0, ::97, ::101])

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    def time_chain(fn, camera=cam, n=8, reps=3):
        """Median (t_n - t_1)/(n-1): pure device + dispatch throughput."""
        float(fn(*cams(camera, salt=0.77), jnp.int32(n)))  # compile/warm
        t1s, tns = [], []
        for rep in range(reps):
            v, c = cams(camera, salt=0.1 * rep + 0.029)
            t0 = time.time()
            float(fn(v, c, jnp.int32(1)))
            t1s.append(time.time() - t0)
            v, c = cams(camera, salt=0.1 * rep + 0.51)
            t0 = time.time()
            float(fn(v, c, jnp.int32(n)))
            tns.append(time.time() - t0)
        frame_s = (np.median(tns) - np.median(t1s)) / (n - 1)
        return max(float(frame_s), 1e-6)

    # ---- primary: tornado opaque 1080p (analytic-coverage AA on) ----------
    chain_opaque = make_chain(
        lambda vp, cp: render_tubes(scene, vp, cp, ab, settings)
    )
    fps = 1.0 / time_chain(chain_opaque, n=16)
    record.update(
        metric="tornado_tubes_1080p_device_fps",
        value=round(fps, 2),
        unit="frames/s",
        vs_baseline=round(fps / 30.0, 3),
    )
    emit()

    # AA-cost split: same frame with analytic-coverage AA off.
    settings_noaa = RasterSettings(width=W, height=H, tile_w=32, tile_h=16,
                                   aa=False)
    chain_noaa = make_chain(
        lambda vp, cp: render_tubes(scene, vp, cp, ab, settings_noaa)
    )
    fps_noaa = 1.0 / time_chain(chain_noaa, n=16)
    record["opaque_noaa_1080p_device_fps"] = round(fps_noaa, 2)
    record["aa_note"] = "primary metric includes analytic-coverage AA"
    emit()

    # ---- prism: the reference's triangle-8 raster geometry at 1080p -------
    # tubeGeometry='prism' (kernels/raster_prism.py): ring vertices,
    # frames and faceted silhouette identical to the 8-subdiv triangle
    # tube (Tubes.hpp:40, LineData.hpp:374-386) — the parity flagship.
    try:
        gate(120, "prism")
        from linevis_tpu.render.tube_raster import (
            build_prism_scene,
            render_tubes_prism,
        )

        scene_p = build_prism_scene(
            traj.positions, traj.mask, traj.attributes[:, 0], radius=0.0015
        )
        chain_prism = make_chain(
            lambda vp, cp: render_tubes_prism(scene_p, vp, cp, ab, settings)
        )
        fps_p = 1.0 / time_chain(chain_prism, n=16)
        record["tornado_prism8_1080p_device_fps"] = round(fps_p, 2)
        record["prism_vs_bar30"] = round(fps_p / 30.0, 3)
        emit()
    except _Skip:
        emit()
    except Exception as e:
        record["prism_error"] = repr(e)[:200]
        emit()

    # ---- tornado MLAB 1080p (K=8) ------------------------------------------
    mlab_s = None
    try:
        gate(120, "mlab")
        chain_mlab = make_chain(
            lambda vp, cp: render_tubes_mlab(
                scene, vp, cp, ab, settings_oit, K=8, opacity=0.3
            )
        )
        mlab_s = time_chain(chain_mlab, n=8)
        record["mlab_1080p_device_fps"] = round(1.0 / mlab_s, 2)
        emit()
    except _Skip:
        emit()

    # ---- cfg4: Femur PSL bands, MLAB + MBOIT 1080p (bar 30) ---------------
    try:
        gate(180, "cfg4_femur")
        from tests.baseline_scenes import _femur_line_data

        ld4 = _femur_line_data()
        scene4 = ld4.get_capsule_scene()
        seg_alpha4 = jnp.asarray(ld4.get_segment_opacity_rows())
        cam4 = Camera(position=(0.0, 0.1, 1.2), width=W, height=H)
        ab4 = jnp.asarray(_proj_constants(cam4))
        chain_femur_mlab = make_chain(
            lambda vp, cp: render_tubes_mlab(
                scene4, vp, cp, ab4, settings_oit, K=8, opacity=0.45,
                seg_alpha=seg_alpha4,
            )
        )
        f4 = 1.0 / time_chain(chain_femur_mlab, camera=cam4, n=8)
        record["cfg4_femur_mlab_1080p_fps"] = round(f4, 2)
        record["cfg4_femur_mlab_vs_bar30"] = round(f4 / 30.0, 3)
        emit()

        chain_femur_mboit = make_chain(
            lambda vp, cp: render_tubes_mboit(
                scene4, vp, cp, ab4, settings_oit, n_mom=4, opacity=0.45,
            )
        )
        f4b = 1.0 / time_chain(chain_femur_mboit, camera=cam4, n=8)
        record["cfg4_femur_mboit_1080p_fps"] = round(f4b, 2)
        record["cfg4_femur_mboit_vs_bar30"] = round(f4b / 30.0, 3)
        emit()
    except _Skip:
        emit()
    except Exception as e:  # never lose earlier metrics to a late failure
        record["cfg4_error"] = repr(e)[:200]
        emit()

    # ---- RTAO: tornado 960x540 4 spp (headline Mrays/s) -------------------
    from linevis_tpu.kernels.ao_grid import build_segment_grid
    from linevis_tpu.render.rtao import RtaoSettings, render_tubes_rtao

    rtao = RtaoSettings(num_samples=4)
    try:
        gate(180, "rtao_headline")
        grid = build_segment_grid(
            scene.a, scene.ba, scene.radius, scene.mask,
            resolution=rtao.grid_resolution,
        )
        Wr, Hr = 960, 540
        cam_r = Camera(position=(0.0, 0.1, 1.2), width=Wr, height=Hr)
        ab_r = jnp.asarray(_proj_constants(cam_r))
        settings_r = RasterSettings(width=Wr, height=Hr, tile_w=32, tile_h=16)
        chain_rtao = make_chain(
            lambda vp, cp: render_tubes_rtao(
                scene, vp, cp, ab_r, settings_r, rtao, grid=grid
            )
        )
        rtao_s = time_chain(chain_rtao, camera=cam_r, n=8)
        record["rtao_mrays_per_s"] = round(Wr * Hr * 4 / rtao_s / 1e6, 2)
        record["rtao_960x540_4spp_device_fps"] = round(1.0 / rtao_s, 2)
        emit()
    except _Skip:
        emit()

    # ---- cfg3: convection RTAO 4 spp 1080p (report Mrays/s) ---------------
    try:
        gate(300, "cfg3_rtao_1080p")

        def convection(p, time=0.0):
            x, y, z = p[..., 0], p[..., 1], p[..., 2]
            k = 2.0 * np.pi
            vx = jnp.sin(k * x) * jnp.cos(k * y)
            vy = -jnp.cos(k * x) * jnp.sin(k * y)
            vz = 0.3 * jnp.sin(k * x) * jnp.sin(k * z)
            return jnp.stack([vx, vy, vz], axis=-1)

        traj3 = trace_streamlines(
            convection,
            StreamlineTracingSettings(num_seeds=256, max_steps=300,
                                      dt=1.0 / 120.0),
        )
        traj3 = normalize_attributes(normalize_trajectories(traj3))
        scene3 = build_capsule_scene(
            traj3.positions, traj3.mask, traj3.attributes[:, 0], radius=0.002
        )
        grid3 = build_segment_grid(
            scene3.a, scene3.ba, scene3.radius, scene3.mask,
            resolution=rtao.grid_resolution,
        )
        # Full 1080p: RtaoSettings.rays_per_batch streams the (cell, ray)
        # pair expansion through lax.map batches, so the 8.3M-ray frame no
        # longer exceeds the remote compiler's memory budget (r4 ran this
        # at 960x540).
        chain_rtao3 = make_chain(
            lambda vp, cp: render_tubes_rtao(
                scene3, vp, cp, ab, settings, rtao, grid=grid3
            )
        )
        r3_s = time_chain(chain_rtao3, n=4, reps=2)
        record["cfg3_rtao_1080p_fps"] = round(1.0 / r3_s, 2)
        record["cfg3_rtao_mrays_per_s"] = round(W * H * 4 / r3_s / 1e6, 2)
        emit()
    except _Skip:
        emit()
    except Exception as e:
        record["cfg3_error"] = repr(e)[:200]
        emit()

    # ---- cfg1: tornado opaque 800x600 (bar 30) -----------------------------
    try:
        gate(90, "cfg1_opaque")
        W1, H1 = 800, 608  # 608: tile_h-aligned (reference runs 800x600)
        cam1 = Camera(position=(0.0, 0.1, 1.2), width=W1, height=H1)
        ab1 = jnp.asarray(_proj_constants(cam1))
        settings1 = RasterSettings(width=W1, height=H1, tile_w=32, tile_h=16)
        chain_1 = make_chain(
            lambda vp, cp: render_tubes(scene, vp, cp, ab1, settings1)
        )
        f1 = 1.0 / time_chain(chain_1, camera=cam1, n=16)
        record["cfg1_opaque_800x600_fps"] = round(f1, 2)
        record["cfg1_opaque_vs_bar30"] = round(f1 / 30.0, 3)
        emit()
    except _Skip:
        emit()

    # ---- cfg2: tornado PPLL (bounded K=32 exact sort) 1080p (bar 30) -------
    try:
        gate(180, "cfg2_ppll")
        chain_ppll = make_chain(
            lambda vp, cp: render_tubes_mlab(
                scene, vp, cp, ab, settings_oit, K=32, opacity=0.3
            )
        )
        f2 = 1.0 / time_chain(chain_ppll, n=4, reps=2)
        record["cfg2_ppll_1080p_fps"] = round(f2, 2)
        record["cfg2_ppll_vs_bar30"] = round(f2 / 30.0, 3)
        emit()
    except _Skip:
        emit()

    # ---- cfg5: tornado opacity optimization + camera flight (bar 30) -------
    try:
        gate(240, "cfg5_opacityopt")
        from linevis_tpu.render.opacity_optimization import (
            OpacityOptimizationSettings,
            _final_render,
            _opacity_solve,
        )

        oo = OpacityOptimizationSettings()
        L, P = traj.positions.shape[0], traj.positions.shape[1]

        @jax.jit
        def run_oo(vps, cps, n):
            def body(i, state):
                acc, vo = state
                vo = _opacity_solve(
                    scene, vps[i], cps[i], ab, vo, settings_oit, oo, L, P
                )
                img = _final_render(
                    scene, vps[i], cps[i], ab, vo, settings_oit, oo.render_k
                )
                return (acc + jnp.sum(img[0, ::97, ::101]), vo)

            init = (jnp.float32(0.0), jnp.ones((L, P), jnp.float32))
            return jax.lax.fori_loop(0, n, body, init)[0]

        f5_s = time_chain(run_oo, n=6, reps=2)
        record["cfg5_opacityopt_1080p_fps"] = round(1.0 / f5_s, 2)
        record["cfg5_opacityopt_vs_bar30"] = round(1.0 / f5_s / 30.0, 3)
        emit()
    except _Skip:
        emit()
    except Exception as e:
        record["cfg5_error"] = repr(e)[:200]
        emit()

    # ---- ray-traced transparency: Pallas wavefront BVH kernel -------------
    # Builder-quality delta (bvhBuildAlgorithm justification,
    # NodesBVHTreePayload.cpp:474-521 role): r5 measured linear LBVH at
    # 1.11 Mrays/s vs binned-SAH at 8.77 (docs/RT_BUILDER_DELTA.md); the
    # bench runs the binned-SAH build, memoized on disk (the host-side
    # build is ~67 s; the BVH is camera-independent).
    try:
        gate(300, "rt_wavefront")
        from linevis_tpu.render.ray_tracer import (
            build_wide_capsule_bvh,
            render_tubes_raytraced_wavefront,
        )

        cache_f = "out/bvh_sah_tornado_bench.npz"
        try:
            wide_groups = jnp.asarray(np.load(cache_f)["groups"])
        except Exception:
            wide_groups = build_wide_capsule_bvh(scene, builder="binned_sah")
            os.makedirs("out", exist_ok=True)
            np.savez(cache_f, groups=np.asarray(wide_groups))
        chain_rt = make_chain(
            lambda vp, cp: render_tubes_raytraced_wavefront(
                scene, vp, cp, ab, settings_oit, K=8, opacity=0.3,
                wide_groups=wide_groups,
            )
        )
        rt_s = time_chain(chain_rt, n=2, reps=2)
        record["rt_wavefront_sah_1080p_fps"] = round(1.0 / rt_s, 2)
        record["rt_wavefront_primary_mrays_per_s"] = round(
            W * H / rt_s / 1e6, 2
        )
        record["rt_builder_delta_note"] = (
            "linear LBVH 1.11 Mrays/s vs binned-SAH 8.77 (r5, "
            "docs/RT_BUILDER_DELTA.md)"
        )
        emit()
    except _Skip:
        emit()
    except Exception as e:
        record["rt_wavefront_error"] = repr(e)[:200]
        emit()

    # ---- roofline: achieved rates vs v5e peaks ------------------------------
    # Peaks: HBM ~819 GB/s (public v5e spec). VPU f32 FMA peak is estimated
    # at ~5e12 flop/s (8x128 lanes x ~2 FMA issue x 2 flops x ~1.4 GHz) —
    # the capsule kernels are f32 VPU code by design (MXU f32 contractions
    # are reduced-precision; see kernels/raster_capsule.py dot_dn).
    try:
        gate(30, "roofline")
        csr, _, _ = prepare_capsule_frame(
            scene, *map(jnp.asarray, (np.asarray(cam.view_projection_matrix()),
                                      np.asarray(cam.position, np.float32))),
            ab, settings,
        )
        pairs = int(jnp.sum(csr.tile_count))
        Ppix = settings.tile_w * settings.tile_h
        # ~135 f32 ops per (pair, pixel) incl. analytic-coverage AA.
        fl_opaque = pairs * Ppix * 135.0
        by_opaque = pairs * 16 * 4.0  # payload rows DMA'd per pair
        t_opaque = 1.0 / fps
        record["roofline"] = {
            "hbm_peak_B_per_s": 819e9,
            "vpu_f32_peak_flop_per_s_est": 5e12,
            "opaque": {
                "binned_pairs": pairs,
                "est_flop_per_s": round(fl_opaque / t_opaque / 1e12, 3),
                "est_flop_unit": "Tflop/s (est 135 flop/pair/pixel)",
                "payload_B_per_s": round(by_opaque / t_opaque / 1e9, 3),
                "payload_unit": "GB/s (kernel DMA; VMEM reuse excluded)",
                "candidate_pairs_per_s": round(pairs / t_opaque / 1e9, 3),
            },
        }
        if mlab_s is not None:
            record["roofline"]["mlab"] = {
                "frame_ms": round(mlab_s * 1e3, 2),
                "est_flop_per_s": round(
                    pairs * Ppix * 2 * 170.0 / mlab_s / 1e12, 3
                ),
                "est_flop_unit":
                    "Tflop/s (est 170 flop/surface/pixel x 2 surfaces, "
                    "pre-culling upper bound)",
            }
        emit()
    except _Skip:
        emit()
    except Exception as e:
        record["roofline_error"] = repr(e)[:200]
        emit()

    # ---- end-to-end latency: sync + pipelined readback ---------------------
    # A real swapchain ships 8-bit frames and overlaps frame N+1's compute
    # with frame N's device-to-host copy (MainApp.cpp:999-1012 role).
    N_E2E = 10
    try:
        gate(120, "e2e_readback")
    except _Skip:
        emit()
        return

    @jax.jit
    def frame_u8(vp, cp):
        img = render_tubes(scene, vp, cp, ab, settings)
        return jnp.clip(img * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)

    def cam_i(i, salt=0.0):
        c = cam.orbit(0.002 * (i + 1) + salt, 0.1, 1.2)
        return (jnp.asarray(np.asarray(c.view_projection_matrix())),
                jnp.asarray(np.asarray(c.position, np.float32)))

    np.asarray(frame_u8(*cam_i(0, 0.9)))  # compile/warm
    # Sync: force each frame through the tunnel before the next starts.
    ts = []
    for i in range(N_E2E):
        vp, cp = cam_i(i, 0.21)
        t0 = time.time()
        np.asarray(frame_u8(vp, cp))
        ts.append(time.time() - t0)
    ts = np.asarray(ts)
    record["e2e_sync_1080p_avg_fps"] = round(1.0 / ts.mean(), 2)
    # Pipelined: dispatch frame i+1, then consume frame i's host copy.
    for salt, key in ((0.37, "e2e_1080p_avg_fps"),):
        frames = []
        t0 = time.time()
        for i in range(N_E2E):
            img = frame_u8(*cam_i(i, salt))
            try:
                img.copy_to_host_async()
            except Exception:
                pass
            frames.append(img)
            if len(frames) > 1:
                np.asarray(frames.pop(0))
        np.asarray(frames.pop(0))
        total = time.time() - t0
        record[key] = round(N_E2E / total, 2)
    record["e2e_note"] = (
        "e2e ships the REAL 8-bit frame (8.3 MB) through the axon dev "
        "tunnel (~40 MB/s => ~210 ms/frame floor; r3's e2e fetched only "
        "a scalar checksum); pipelined overlaps frame i+1 compute with "
        "frame i readback. A production host link (PCIe, ~10+ GB/s) "
        "makes this transfer sub-millisecond — device_fps is the "
        "hardware-meaningful number."
    )
    emit()


if __name__ == "__main__":
    main()
