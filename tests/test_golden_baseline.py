"""Full-resolution goldens for the five BASELINE.json configs.

Opt-in (real TPU; a 1080p interpret-mode render takes ~30 min on CPU):

    LINEVIS_TPU_GOLDEN=1 python -m pytest tests/test_golden_baseline.py -m ""

Gate: SSIM >= 0.99 + image-mean difference <= 2e-3 against the goldens
in tests/golden_baseline/ (regenerate after an intentional rendering
change with `python -m tests.golden_gen_baseline`, on the TPU).
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_baseline")

_ON = os.environ.get("LINEVIS_TPU_GOLDEN", "") == "1"


@pytest.mark.slow
@pytest.mark.skipif(not _ON, reason="set LINEVIS_TPU_GOLDEN=1 (real TPU)")
@pytest.mark.parametrize("name", [
    "cfg1_tornado_opaque_800x600",
    "cfg2_tornado_ppll_1080p",
    "cfg3_convection_rtao_1080p",
    "cfg4_femur_mlab_1080p",
    "cfg4b_femur_mboit_1080p",
    "cfg5_tornado_opacityopt_1080p",
])
def test_baseline_config_golden(name):
    from linevis_tpu.render.framebuffer import (
        image_mean_difference,
        load_png,
        ssim,
        to_srgb_u8,
    )

    from tests.baseline_scenes import BASELINE_SCENES

    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: python -m tests.golden_gen_baseline")
    golden = np.asarray(load_png(path), np.float64) / 255.0
    img = BASELINE_SCENES[name]()
    rendered = np.asarray(to_srgb_u8(img), np.float64) / 255.0
    assert rendered.shape == golden.shape
    assert np.isfinite(rendered).all()
    s = ssim(rendered[..., :3], golden[..., :3])
    assert s >= 0.99, f"{name}: SSIM {s:.4f} < 0.99"
    assert image_mean_difference(rendered[..., :3], golden[..., :3]) <= 2e-3


@pytest.mark.parametrize("name", [
    "cfg2_tornado_ppll_1080p",
    pytest.param("cfg5_tornado_opacityopt_1080p",
                 marks=pytest.mark.slow),
])
def test_baseline_config_smoke_small(name, monkeypatch):
    """CPU smoke: every builder path runs end-to-end at ~1/20 scale, so
    a broken config is caught before burning TPU golden time."""
    from tests.baseline_scenes import BASELINE_SCENES

    monkeypatch.setenv("LINEVIS_BASELINE_SCALE", "0.05")
    img = BASELINE_SCENES[name]()
    assert np.isfinite(np.asarray(img)).all()
    assert np.asarray(img).ndim == 3
