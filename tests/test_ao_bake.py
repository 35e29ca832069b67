"""AO prebaker tests (VulkanAmbientOcclusionBaker semantics)."""

import numpy as np

from linevis_tpu.render.ao_bake import (
    AoBakeSettings,
    bake_ambient_occlusion,
    segment_average_ao,
)


def _straight_line(y=0.0, z=0.0, n=8):
    pos = np.zeros((1, n, 3), np.float32)
    pos[0, :, 0] = np.linspace(-0.4, 0.4, n)
    pos[0, :, 1] = y
    pos[0, :, 2] = z
    return pos


def test_isolated_tube_unoccluded():
    pos = _straight_line()
    mask = np.ones(pos.shape[:2], bool)
    ao = bake_ambient_occlusion(
        pos, mask, radius=0.02,
        bake=AoBakeSettings(num_frames=4, samples_per_frame=4, seed=1),
    )
    assert ao.shape == (1, 8, 8)
    # An isolated straight tube only occludes itself tangentially;
    # interior vertices should be nearly unoccluded.
    assert ao[0, 2:-2].mean() > 0.9, ao[0, 2:-2].mean()


def test_parallel_tubes_occlude_facing_sides():
    gap = 0.01
    pos = np.concatenate(
        [_straight_line(y=0.0), _straight_line(y=2 * 0.02 + gap)], axis=0
    )
    mask = np.ones(pos.shape[:2], bool)
    bake = AoBakeSettings(num_frames=6, samples_per_frame=4, seed=3)
    ao = bake_ambient_occlusion(pos, mask, radius=0.02, bake=bake)
    iso = bake_ambient_occlusion(pos[:1], mask[:1], radius=0.02, bake=bake)
    # The pair must be (strictly) more occluded than the isolated tube.
    assert ao[0, 2:-2].mean() < iso[0, 2:-2].mean() - 0.03, (
        ao[0, 2:-2].mean(), iso[0, 2:-2].mean(),
    )


def test_bake_estimator_mean_across_seeds():
    """Monte-Carlo AO means agree across seeds (reference estimator-mean
    test style, TestVolumetricPathTracing.cpp:92-95)."""
    pos = np.concatenate(
        [_straight_line(y=0.0), _straight_line(y=0.05)], axis=0
    )
    mask = np.ones(pos.shape[:2], bool)
    means = []
    for seed in (0, 1):
        bake = AoBakeSettings(num_frames=8, samples_per_frame=4, seed=seed)
        ao = bake_ambient_occlusion(pos, mask, radius=0.02, bake=bake)
        means.append(ao.mean())
    assert abs(means[0] - means[1]) < 0.05, means


def test_segment_average_rows():
    ao = np.zeros((1, 4, 8), np.float32)
    ao[0, :, :] = np.linspace(0.2, 0.8, 4)[:, None]
    mask = np.ones((1, 4), bool)
    rows = segment_average_ao(ao, mask)
    assert rows.shape == (2, 3)
    np.testing.assert_allclose(rows[0], [0.2, 0.4, 0.6], atol=1e-6)
    np.testing.assert_allclose(rows[1], [0.2, 0.2, 0.2], atol=1e-6)
