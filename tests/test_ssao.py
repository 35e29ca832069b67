"""SSAO / GTAO screen-space AO tests on a synthetic depth buffer."""

import numpy as np
import jax.numpy as jnp

from linevis_tpu.render.ssao import gtao, ssao


def _step_scene(h=32, w=48):
    """A flat plane with a deep trench: trench pixels are occluded, flat
    pixels away from the trench are not."""
    view_z = np.full((h, w), 1.0, np.float32)
    # trench (farther = deeper) in the middle columns
    view_z[:, 20:28] = 1.3
    normal = np.zeros((3, h, w), np.float32)
    normal[2] = -1.0  # facing the camera
    fg = np.ones((h, w), bool)
    basis = np.eye(3, dtype=np.float32)
    basis[:, 2] = (0, 0, 1)
    return (jnp.asarray(view_z), jnp.asarray(normal), jnp.asarray(basis),
            jnp.asarray(fg))


def test_ssao_trench_darker_than_plane():
    view_z, normal, basis, fg = _step_scene()
    ao = np.asarray(ssao(view_z, normal, basis, fg, radius=0.5,
                         num_samples=32))
    assert np.isfinite(ao).all()
    assert (ao >= 0).all() and (ao <= 1).all()
    trench = ao[8:24, 22:26].mean()
    plane = ao[8:24, 4:12].mean()
    assert trench < plane - 0.05, (trench, plane)


def test_gtao_trench_darker_than_plane():
    view_z, normal, basis, fg = _step_scene()
    ao = np.asarray(gtao(view_z, normal, basis, fg, radius=0.6))
    assert np.isfinite(ao).all()
    trench = ao[8:24, 22:26].mean()
    plane = ao[8:24, 4:12].mean()
    assert trench < plane - 0.05, (trench, plane)


def test_background_unoccluded():
    view_z, normal, basis, fg = _step_scene()
    fg = jnp.asarray(np.zeros(fg.shape, bool))
    ao = np.asarray(ssao(view_z, normal, basis, fg))
    np.testing.assert_allclose(ao, 1.0)
