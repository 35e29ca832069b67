"""Block-sparse grids (the vendored-NanoVDB role,
`src/Renderers/Scattering/nanovdb/*` + `PNanoVDB.glsl`)."""

import numpy as np
import jax
import jax.numpy as jnp

from linevis_tpu.scene.sparse_grid import SparseGrid
from linevis_tpu.trace.fields import sample_grid_trilinear


def _cloud(res=20, seed=7):
    """Mostly-empty volume with two dense blobs."""
    rng = np.random.default_rng(seed)
    g = np.zeros((res, res, res), np.float32)
    g[2:7, 3:8, 4:9] = rng.uniform(0.2, 1.0, (5, 5, 5))
    blob = g[res - 8:res - 3, res - 9:res - 5, res - 10:res - 4]
    blob[...] = rng.uniform(0.2, 1.0, blob.shape)
    return g


def test_sparse_matches_dense_trilinear():
    g = _cloud()
    sp = SparseGrid.from_dense(g, block=8)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (512, 3)).astype(np.float32)
    dense = np.asarray(
        sample_grid_trilinear(jnp.asarray(g)[..., None], jnp.asarray(pts))[
            ..., 0
        ]
    )
    sparse = np.asarray(sp.sample(jnp.asarray(pts)))
    np.testing.assert_array_equal(sparse, dense)


def test_sparse_memory_savings():
    g = _cloud(res=32)
    sp = SparseGrid.from_dense(g, block=8)
    assert sp.n_active < 16  # two blobs -> few active bricks
    assert sp.memory_ratio() < 0.5


def test_vpt_sparse_equals_dense():
    """Delta tracking on the SparseGrid: identical image to the dense
    grid (same PRNG stream, same trilinear samples)."""
    from linevis_tpu.render.camera import Camera
    from linevis_tpu.render.tube_raster import _ray_basis
    from linevis_tpu.render.vpt import VptSettings, render_vpt

    g = _cloud(res=16)
    sp = SparseGrid.from_dense(g, block=8)
    cam = Camera(position=(0.0, 0.1, 0.9), look_at_point=(0, 0, 0),
                 width=32, height=24)
    basis = _ray_basis(jnp.asarray(cam.view_projection_matrix()))
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    s = VptSettings(extinction=(120.0,) * 3, max_events=96)
    a = np.asarray(render_vpt(jax.random.PRNGKey(2), jnp.asarray(g), cp,
                              basis, 32, 24, settings=s, spp=2))
    b = np.asarray(render_vpt(jax.random.PRNGKey(2), sp, cp,
                              basis, 32, 24, settings=s, spp=2))
    np.testing.assert_allclose(a, b, atol=1e-5)
