"""Regenerate the golden images: python -m tests.golden_gen"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from linevis_tpu.render.framebuffer import save_png  # noqa: E402
from tests.golden_scenes import ALL_SCENES  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in sorted(ALL_SCENES.items()):
        img = fn()
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        save_png(path, img)
        print("wrote", path, img.shape)


if __name__ == "__main__":
    main()
