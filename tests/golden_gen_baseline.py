"""Regenerate the BASELINE-config goldens (run on the real TPU):

    PYTHONPATH=/root/repo:$PYTHONPATH python -m tests.golden_gen_baseline
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import numpy as np

    from linevis_tpu.render.framebuffer import save_png, to_srgb_u8
    from tests.baseline_scenes import BASELINE_SCENES

    out_dir = os.path.join(os.path.dirname(__file__), "golden_baseline")
    os.makedirs(out_dir, exist_ok=True)
    only = sys.argv[1:] or sorted(BASELINE_SCENES)
    for name in only:
        t0 = time.time()
        img = BASELINE_SCENES[name]()
        img = np.asarray(img)
        assert np.isfinite(img).all(), name
        save_png(os.path.join(out_dir, f"{name}.png"), to_srgb_u8(img))
        print(f"{name}: {img.shape} in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
