"""Cloud grid loaders (.xyz / .dat+.raw / .nvdb) + env-map lighting
(reference CloudData.cpp:86-444, VolumetricPathTracingPass.hpp:169-174)."""

import numpy as np
import pytest

from linevis_tpu.loaders.cloud_loader import (
    load_cloud_dat_raw,
    load_cloud_file,
    load_cloud_nvdb,
    load_cloud_xyz,
    write_cloud_xyz,
    write_nvdb,
)


def _blob(nz=12, ny=10, nx=14, seed=3):
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(
        np.linspace(-1, 1, nz), np.linspace(-1, 1, ny),
        np.linspace(-1, 1, nx), indexing="ij",
    )
    d = np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32)
    d += 0.02 * rng.random((nz, ny, nx)).astype(np.float32)
    return d


def test_xyz_roundtrip(tmp_path):
    d = _blob()
    path = str(tmp_path / "cloud.xyz")
    write_cloud_xyz(path, d, voxel_size=(0.5, 1.0, 2.0))
    cloud = load_cloud_file(path)
    assert cloud.shape == d.shape
    # min-max normalized with the (0, lowest) seed: min(d) > 0 here, so
    # the divisor is max(d) and min stays un-subtracted.
    np.testing.assert_allclose(cloud.density, d / d.max(), atol=1e-6)
    np.testing.assert_allclose(cloud.voxel_size, [0.5, 1.0, 2.0])
    # computeGridBounds: box_max = gridSize * 0.25 / maxDim.
    np.testing.assert_allclose(
        cloud.box_max, np.asarray([14, 10, 12]) * 0.25 / 14.0, atol=1e-6
    )
    np.testing.assert_allclose(cloud.box_min, -cloud.box_max)


def test_dat_raw_pair(tmp_path):
    d = (_blob() * 255).astype(np.uint8)
    (tmp_path / "vol.raw").write_bytes(d.tobytes())
    (tmp_path / "vol.dat").write_text(
        "ObjectFileName: vol.raw\n"
        "Resolution: 14 10 12\n"
        "Format: uchar\n"
    )
    cloud = load_cloud_dat_raw(str(tmp_path / "vol.dat"))
    assert cloud.shape == (12, 10, 14)
    expect = d.astype(np.float32) / 255.0
    expect = expect / expect.max()
    np.testing.assert_allclose(cloud.density, expect, atol=1e-6)
    # .raw entry point finds the .dat next to it.
    cloud2 = load_cloud_dat_raw(str(tmp_path / "vol.raw"))
    np.testing.assert_array_equal(cloud.density, cloud2.density)


def test_nvdb_roundtrip_sparse(tmp_path):
    """write_nvdb -> load_cloud_nvdb reproduces a dense field exactly,
    with empty 8^3 leaves genuinely omitted from the file."""
    d = np.zeros((24, 16, 32), np.float32)
    d[2:9, 3:12, 4:20] = _blob(7, 9, 16)
    d[17:24, 1:8, 25:32] = 0.7
    path = str(tmp_path / "cloud.nvdb")
    write_nvdb(path, d)
    import os

    # Empty leaves are omitted: the sparse file is smaller than the same
    # field written fully dense (the fixed 264 KB upper node dominates
    # small grids either way, so compare like with like).
    dense_path = str(tmp_path / "dense.nvdb")
    write_nvdb(dense_path, d + 1.0)
    assert os.path.getsize(path) < os.path.getsize(dense_path)
    cloud = load_cloud_nvdb(path)
    assert cloud.shape == d.shape
    np.testing.assert_array_equal(cloud.density, d)

    # Dispatcher.
    cloud2 = load_cloud_file(path)
    np.testing.assert_array_equal(cloud2.density, d)


def test_nvdb_background_and_offsets(tmp_path):
    d = np.full((8, 8, 8), 0.25, np.float32)
    path = str(tmp_path / "bg.nvdb")
    write_nvdb(path, d, background=0.25)
    cloud = load_cloud_nvdb(path)
    # Every leaf equals the background -> written as empty tree, read
    # back as the background everywhere.
    np.testing.assert_allclose(cloud.density, 0.25)


def test_vpt_env_map_lighting(tmp_path):
    """VPT under an environment map: escaping rays return env radiance x
    intensity; a uniform red env with zero density yields red pixels."""
    import jax
    import jax.numpy as jnp

    from linevis_tpu.render.vpt import VptSettings, render_vpt

    grid = jnp.zeros((4, 4, 4), jnp.float32)
    env = np.zeros((8, 16, 3), np.float32)
    env[..., 0] = 2.0  # uniform red
    basis = jnp.eye(3)
    img = render_vpt(
        jax.random.PRNGKey(0), grid,
        jnp.asarray([0.0, 0.0, -2.0]), basis, 8, 6,
        settings=VptSettings(max_events=8), spp=1,
        env_map=jnp.asarray(env), env_intensity=0.5,
    )
    img = np.asarray(img)
    np.testing.assert_allclose(img[..., 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(img[..., 1:], 0.0, atol=1e-5)


def test_env_map_loader_png_and_hdr(tmp_path):
    from PIL import Image

    from linevis_tpu.render.env_map import load_environment_map

    arr = np.zeros((4, 8, 3), np.uint8)
    arr[..., 1] = 188  # sRGB 188/255 ~ linear 0.5
    Image.fromarray(arr).save(str(tmp_path / "env.png"))
    env = load_environment_map(str(tmp_path / "env.png"))
    assert env.shape == (4, 8, 3)
    assert abs(env[0, 0, 1] - 0.5) < 0.02

    # Radiance HDR (flat scanlines): value = (m + 0.5) * 2^(e-136).
    h, w = 2, 4
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., 0] = 128
    rgbe[..., 3] = 129  # 128.5 * 2^-7 ~ 1.004
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + \
        f"-Y {h} +X {w}\n".encode()
    (tmp_path / "env.hdr").write_bytes(header + rgbe.tobytes())
    envh = load_environment_map(str(tmp_path / "env.hdr"))
    assert envh.shape == (2, 4, 3)
    np.testing.assert_allclose(envh[..., 0], 128.5 / 128.0, rtol=1e-5)


def test_sample_env_map_directions():
    import jax.numpy as jnp

    from linevis_tpu.render.env_map import sample_env_map

    env = np.zeros((8, 16, 3), np.float32)
    env[:2] = (0.0, 1.0, 0.0)  # top rows (up)
    env[-2:] = (0.0, 0.0, 1.0)  # bottom rows (down)
    up = sample_env_map(jnp.asarray(env), jnp.asarray([0.0, 1.0, 0.0]), 1.0)
    down = sample_env_map(
        jnp.asarray(env), jnp.asarray([0.0, -1.0, 0.0]), 1.0
    )
    assert float(up[1]) > 0.9 and float(up[2]) < 0.1
    assert float(down[2]) > 0.9 and float(down[1]) < 0.1
