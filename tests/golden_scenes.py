"""Deterministic scenes for the golden-image SSIM harness.

The reference's de-facto regression protocol is scripted screenshots +
statistical image comparison (SURVEY §4; ReplayWidget.cpp:620,
TestVolumetricPathTracing.cpp:92-115).  The reference renderer itself
cannot be built in this environment (its platform layer `sgl` plus
Vulkan/shaderc are absent), so golden images are produced by THIS
framework with the shading math pinned to the reference's
`Data/Shaders/Utils/Lighting.glsl` constants — see
docs/SSIM_GAP_ANALYSIS.md for the line-by-line constant audit and the
known residual deviations.

Every scene here must be bit-deterministic on a given platform (fixed
numpy seeds, no jax.random in scene construction, interpret-mode kernels
under the CPU conftest).
"""

import numpy as np

GOLDEN_SIZE = (160, 120)  # (W, H)
SMALL_SIZE = (64, 48)


def _settings(w, h):
    from linevis_tpu.render.pipeline import RasterSettings

    return RasterSettings(width=w, height=h, tile_w=16, tile_h=8, chunk=32,
                          span_x=3, span_y=3, depth_cue_strength=0.2)


def _camera(w, h, pos=(0.0, 0.1, 1.2)):
    from linevis_tpu.render.camera import Camera

    return Camera(position=pos, look_at_point=(0, 0, 0), width=w, height=h)


def _walk_scene(radius=0.02, L=10, P=8, seed=11):
    from linevis_tpu.render.tube_raster import build_capsule_scene

    rng = np.random.default_rng(seed)
    pos = np.cumsum(rng.normal(0, 0.07, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    mask = np.ones((L, P), bool)
    attrs = rng.uniform(0, 1, (L, P)).astype(np.float32)
    return build_capsule_scene(pos, mask, attrs, radius=radius)


def scene_opaque_tubes():
    """Config-1 style: opaque capsule raster with depth cues."""
    from linevis_tpu.render.tube_raster import render_tubes_image

    w, h = GOLDEN_SIZE
    return render_tubes_image(
        _walk_scene(), _camera(w, h), settings=_settings(w, h)
    )


def scene_triangle_tubes():
    """Opaque renderer with tubeGeometry='triangle': the reference's
    8-subdivision triangle-tube raster default (Tubes.hpp:40,
    LineData.hpp:374-386) through the G-buffer pipeline."""
    from linevis_tpu.core.settings import SettingsMap
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.renderer import create_renderer

    w, h = GOLDEN_SIZE
    r = create_renderer(
        "Opaque",
        SettingsMap({"tubeGeometry": "triangle", "depth_cue_strength": 0.2}),
    )
    r.set_line_data(_line_data(seed=11, width=0.04))
    return r.render(Camera(position=(0.0, 0.1, 1.2),
                           look_at_point=(0, 0, 0), width=w, height=h))


def scene_prism_tubes():
    """Opaque renderer with tubeGeometry='prism': the same triangle-8
    geometry as scene_triangle_tubes through the analytic prism kernel
    (`kernels/raster_prism.py`) — the benchable flagship parity path."""
    from linevis_tpu.core.settings import SettingsMap
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.renderer import create_renderer

    w, h = GOLDEN_SIZE
    r = create_renderer(
        "Opaque",
        SettingsMap({"tubeGeometry": "prism", "depth_cue_strength": 0.2}),
    )
    r.set_line_data(_line_data(seed=11, width=0.04))
    return r.render(Camera(position=(0.0, 0.1, 1.2),
                           look_at_point=(0, 0, 0), width=w, height=h))


def scene_mlab_transparent():
    """Config-2 style: MLAB K=8 transparency."""
    from linevis_tpu.render.oit import render_tubes_mlab_image

    w, h = SMALL_SIZE
    return render_tubes_mlab_image(
        _walk_scene(radius=0.03, seed=12), _camera(w, h),
        settings=_settings(w, h), K=8, opacity=0.4,
    )


def scene_mboit():
    """Config-4 OIT variant: moment-based OIT, 4 power moments."""
    import jax.numpy as jnp

    from linevis_tpu.render.oit import render_tubes_mboit
    from linevis_tpu.render.tube_raster import _proj_constants

    w, h = SMALL_SIZE
    cam = _camera(w, h)
    img = render_tubes_mboit(
        _walk_scene(radius=0.03, seed=12),
        jnp.asarray(cam.view_projection_matrix()),
        jnp.asarray(np.asarray(cam.position, np.float32)),
        jnp.asarray(_proj_constants(cam)),
        _settings(w, h), n_mom=4, opacity=0.4,
    )
    return np.moveaxis(np.asarray(img), 0, -1)


def scene_stress_bands(tmp_dir="out"):
    """Config-4 geometry: eigenvalue-ratio elliptic bands (synthetic PSL)."""
    import os

    from examples.render_stress_bands import synth_v3_blocks
    from linevis_tpu.loaders.stress_dat import (
        SimulationMeshHull,
        write_stress_trajectories_dat_v3,
    )
    from linevis_tpu.render.opaque import render_opaque_image
    from linevis_tpu.scene.line_data_stress import LineDataStress

    w, h = SMALL_SIZE
    rng = np.random.default_rng(42)
    blocks = synth_v3_blocks(rng, lines_per_ps=8, n=24)
    theta = np.linspace(0, 2 * np.pi, 9, dtype=np.float32)[:-1]
    ring = np.stack([0.5 * np.cos(theta), 0.5 * np.sin(theta),
                     0 * theta - 1], 1)
    top = ring.copy()
    top[:, 2] = 1
    verts = np.concatenate([ring, top]).astype(np.float32)
    k = len(theta)
    tris = []
    for i in range(k):
        q = [i, (i + 1) % k, k + (i + 1) % k, k + i]
        tris += [[q[0], q[1], q[2]], [q[0], q[2], q[3]]]
    hull = SimulationMeshHull(
        vertices=verts, triangles=np.array(tris, np.int32)
    )
    os.makedirs(tmp_dir, exist_ok=True)
    path = os.path.join(tmp_dir, "golden_psl_v3.dat")
    write_stress_trajectories_dat_v3(path, blocks, hull)
    ld = LineDataStress.load_from_dat([path], version=3)
    ld.set_band_render_mode("EIGENVALUE_RATIO")
    mesh = ld.get_band_tube_mesh(band_width=0.012, num_subdivisions=8)
    cam = _camera(w, h, pos=(0.45, 0.25, 0.6))
    return render_opaque_image(mesh, cam, settings=_settings(w, h))


def scene_vrc():
    """Voxel ray casting: quantized voxel curves."""
    from linevis_tpu.core.trajectories import Trajectories
    from linevis_tpu.render.renderer import create_renderer
    from linevis_tpu.scene.line_data import LineData

    w, h = SMALL_SIZE
    rng = np.random.default_rng(21)
    L, P = 6, 8
    pos = np.cumsum(rng.normal(0, 0.06, (L, P, 3)), axis=1).astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    traj = Trajectories(
        positions=pos,
        attributes=rng.uniform(0, 1, (L, 1, P)).astype(np.float32),
        mask=np.ones((L, P), bool),
        num_points=np.full((L,), P, np.int32),
        attribute_names=["a"],
    )
    ld = LineData(traj)
    ld.set_line_width(0.04)
    r = create_renderer("Voxel Ray Casting")
    r.set_line_data(ld)
    return r.render(_camera(w, h))


def scene_surface_cube():
    """Indexed-surface raster path with the surface Blinn-Phong."""
    from linevis_tpu.loaders.mesh_loader import SurfaceMesh, load_surface_mesh
    from linevis_tpu.scene.triangle_mesh_data import (
        TriangleMeshData,
        TriangleMeshRenderer,
    )

    import os
    import tempfile

    w, h = SMALL_SIZE
    verts = [(-1, -1, -1), (1, -1, -1), (1, 1, -1), (-1, 1, -1),
             (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1)]
    faces = [(1, 4, 3, 2), (5, 6, 7, 8), (1, 2, 6, 5), (3, 4, 8, 7),
             (2, 3, 7, 6), (1, 5, 8, 4)]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "cube.obj")
        with open(path, "w") as f:
            for p in verts:
                f.write(f"v {p[0]} {p[1]} {p[2]}\n")
            for q in faces:
                f.write("f " + " ".join(map(str, q)) + "\n")
        data = TriangleMeshData.load_from_file(path)
    r = TriangleMeshRenderer()
    r.set_line_data(data)
    from linevis_tpu.render.camera import Camera

    return r.render(Camera(position=(0.8, 0.6, 1.2), look_at_point=(0, 0, 0),
                           width=w, height=h))


def scene_multivar():
    """Multi-var sectored tubes through the concatenated-TF LUT."""
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.multivar import (
        MultiVarTransferFunctions,
        build_multivar_tube_mesh,
        combine_transfer_function_table,
    )
    from linevis_tpu.render.opaque import render_opaque_image
    from linevis_tpu.render.transfer_function import TransferFunction

    w, h = SMALL_SIZE
    L, P = 3, 6
    pos = np.zeros((L, P, 3), np.float32)
    pos[:, :, 0] = np.linspace(-0.3, 0.3, P)
    for i in range(L):
        pos[i, :, 1] = -0.15 + 0.15 * i
    mask = np.ones((L, P), bool)
    rng = np.random.default_rng(13)
    a0 = rng.uniform(0, 1, (L, P)).astype(np.float32)
    a1 = rng.uniform(0, 1, (L, P)).astype(np.float32)
    mv = MultiVarTransferFunctions(
        [TransferFunction.standard(), TransferFunction.standard()]
    )
    combined = combine_transfer_function_table(mv)
    mesh = build_multivar_tube_mesh(pos, mask, [a0, a1], radius=0.04,
                                    num_subdivisions=8)
    cam = Camera(position=(0.0, 0.0, 1.2), width=w, height=h)
    return render_opaque_image(mesh, cam, tf=combined,
                               settings=_settings(w, h))


def _line_data(seed=21, L=6, P=8, width=0.09, spread=0.06):
    from linevis_tpu.core.trajectories import Trajectories
    from linevis_tpu.scene.line_data import LineData

    rng = np.random.default_rng(seed)
    pos = np.cumsum(rng.normal(0, spread, (L, P, 3)), axis=1)
    pos = pos.astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    traj = Trajectories(
        positions=pos,
        attributes=rng.uniform(0, 1, (L, 1, P)).astype(np.float32),
        mask=np.ones((L, P), bool),
        num_points=np.full((L,), P, np.int32),
        attribute_names=["a"],
    )
    ld = LineData(traj)
    ld.set_line_width(width)
    return ld


def _registry_scene(mode, settings=None, frames=1, seed=21):
    from linevis_tpu.core.settings import SettingsMap
    from linevis_tpu.render.renderer import create_renderer

    w, h = SMALL_SIZE
    r = create_renderer(mode, SettingsMap(settings or {}))
    r.set_line_data(_line_data(seed=seed))
    cam = _camera(w, h)
    img = r.render(cam)
    for _ in range(frames - 1):  # accumulation modes: fixed frame count
        img = r.render(cam)
    return img


def scene_depth_peeling():
    """Exact front-to-back peeling (DepthPeelingRenderer.cpp role)."""
    return _registry_scene("Depth Peeling", {"opacity": 0.5})


def scene_rtao():
    """RTAO G-buffer + grid-traced AO, 2 accumulation frames, fixed seed."""
    return _registry_scene("RTAO", frames=2)


def scene_opacity_optimization():
    """Opacity-optimization pipeline at a fixed post-movement frame."""
    return _registry_scene("Opacity Optimization", seed=33)


def scene_vpt():
    """Volumetric path tracer on the line density field, fixed seed,
    4 accumulation frames (TestVolumetricPathTracing.cpp protocol)."""
    from linevis_tpu.render.renderer import create_renderer
    from linevis_tpu.scene.line_data_scattering import LineDataScattering

    w, h = SMALL_SIZE
    rng = np.random.default_rng(17)
    L, P = 5, 8
    pos = np.cumsum(rng.normal(0, 0.08, (L, P, 3)), axis=1)
    pos = pos.astype(np.float32)
    pos -= pos.mean(axis=(0, 1))
    from linevis_tpu.core.trajectories import Trajectories

    traj = Trajectories(
        positions=pos,
        attributes=rng.uniform(0, 1, (L, 1, P)).astype(np.float32),
        mask=np.ones((L, P), bool),
        num_points=np.full((L,), P, np.int32),
        attribute_names=["a"],
    )
    # Analytic Gaussian-blob cloud the paths were "traced" in.
    g = 20
    zz, yy, xx = np.meshgrid(*([np.linspace(-1, 1, g)] * 3), indexing="ij")
    cloud = np.exp(-4.0 * (xx**2 + yy**2 + zz**2)).astype(np.float32)
    ld = LineDataScattering(traj, cloud_grid=cloud)
    r = create_renderer("Volumetric Path Tracer")
    r.set_line_data(ld)
    cam = _camera(w, h, pos=(0.0, 0.2, 1.6))
    img = r.render(cam)
    for _ in range(3):
        img = r.render(cam)
    return img


def scene_replay_screenshot():
    """Replay-script-driven E2E frame: a g.* script (the reference's
    Data/ReplayScripts protocol) picks dataset + renderer + settings and
    flies the camera; the golden is the final frame (ReplayWidget.run)."""
    from linevis_tpu.automation.replay import ReplayWidget

    w, h = SMALL_SIZE
    captured = []
    widget = ReplayWidget(lambda name: _line_data(seed=21), fps=2.0,
                          output_dir="/tmp/replay_golden")
    widget.frame_callback = lambda i, img: captured.append(img)
    widget.load_script(
        'g.set_duration(0)\n'
        'g.set_dataset("synthetic")\n'
        'g.set_renderer("Multi-Layer Alpha Blending")\n'
        'g.set_rendering_algorithm_settings({"opacity": 0.5})\n'
        'g.set_camera_position(0.0, 0.2, 1.4)\n'
        'g.set_camera_look_at(0.0, 0.0, 0.0)\n'
        'g.set_duration(1)\n'
        'g.set_camera_position(0.35, 0.25, 1.3)\n'
    )
    widget.run(width=w, height=h)
    return captured[-1]



ALL_SCENES = {
    "opaque_tubes": scene_opaque_tubes,
    "triangle_tubes": scene_triangle_tubes,
    "prism_tubes": scene_prism_tubes,
    "mlab_transparent": scene_mlab_transparent,
    "mboit": scene_mboit,
    "stress_bands": scene_stress_bands,
    "vrc": scene_vrc,
    "surface_cube": scene_surface_cube,
    "multivar": scene_multivar,
    "depth_peeling": scene_depth_peeling,
    "rtao": scene_rtao,
    "opacity_optimization": scene_opacity_optimization,
    "vpt": scene_vpt,
    "replay_screenshot": scene_replay_screenshot,
}
