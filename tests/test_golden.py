"""Golden-image SSIM regression tests.

Gate: SSIM >= 0.99 against the checked-in goldens (the BASELINE.json
threshold), plus the reference's statistical image-mean equality
(<= 2e-3, TestVolumetricPathTracing.cpp:92-95).  Regenerate after an
*intentional* rendering change with:

    python -m tests.golden_gen
"""

import os

import numpy as np
import pytest

from linevis_tpu.render.framebuffer import (
    image_mean_difference,
    load_png,
    ssim,
    to_srgb_u8,
)

from tests.golden_scenes import ALL_SCENES

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# Fast-tier goldens: one per core pipeline family (~20 s each on 1 CPU).
# The remaining scenes run in the full tier (-m "").
_FAST = {"opaque_tubes", "triangle_tubes", "mlab_transparent", "mboit",
         "depth_peeling", "rtao"}


@pytest.mark.parametrize(
    "name",
    [n if n in _FAST else pytest.param(n, marks=pytest.mark.slow)
     for n in sorted(ALL_SCENES)],
)
def test_golden_ssim(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: run python -m tests.golden_gen ({path})")
    golden = np.asarray(load_png(path), np.float64) / 255.0
    img = ALL_SCENES[name]()
    rendered = np.asarray(to_srgb_u8(img), np.float64) / 255.0
    assert rendered.shape == golden.shape, (rendered.shape, golden.shape)
    s = ssim(rendered[..., :3], golden[..., :3])
    assert s >= 0.99, f"{name}: SSIM {s:.4f} < 0.99"
    assert image_mean_difference(
        rendered[..., :3], golden[..., :3]
    ) <= 2e-3, name
