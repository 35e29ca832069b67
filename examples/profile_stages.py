"""Stage-by-stage frame timing on the Tornado scene."""

from functools import partial

from _bench_common import timeit, tornado_scene

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.kernels.raster_pallas import build_csr_binning, rasterize_gbuffer_pallas
from linevis_tpu.render.opaque import render_opaque
from linevis_tpu.render.pipeline import (
    GBUFFER_PLANES,
    RasterSettings,
    build_payload,
    tube_vertex_stage,
)
from linevis_tpu.render.transfer_function import TransferFunction


def main():
    traj, mesh, cam = tornado_scene()
    vp = jnp.asarray(cam.view_projection_matrix())
    cp = jnp.asarray(np.asarray(cam.position, np.float32))
    tft = jnp.asarray(TransferFunction.standard().table)
    S = RasterSettings(pairs_capacity=2_000_000)

    vstage = jax.jit(lambda mesh, vp: tube_vertex_stage(mesh, vp, S.width, S.height))
    t, batch = timeit(vstage, mesh, vp)
    print(f"vertex stage (structured): {t*1000:8.1f} ms")

    payload_fn = jax.jit(build_payload)
    t, payload = timeit(payload_fn, batch)
    print(f"payload (40 plane rows):   {t*1000:8.1f} ms")

    csr_fn = jax.jit(
        lambda tx, ty, pl_, v: build_csr_binning(
            tx, ty, pl_, v, S.width, S.height, S.tile_w, S.tile_h, S.chunk,
            S.span_x, S.span_y, S.pairs_capacity,
        )
    )
    t, csr = timeit(csr_fn, batch.tri_x, batch.tri_y, payload, batch.tri_valid)
    used = int(np.asarray(csr.tile_num_chunks).sum())
    print(f"csr binning:               {t*1000:8.1f} ms  (chunks {used}/{csr.payload.shape[0]}, overflow {int(csr.overflow)})")

    zfn = partial(rasterize_gbuffer_pallas, num_attr_planes=GBUFFER_PLANES,
                  tile_w=S.tile_w, tile_h=S.tile_h)
    t, _ = timeit(zfn, csr)
    print(f"pallas G-buffer pass:      {t*1000:8.1f} ms")

    full = partial(render_opaque, settings=S)
    t, img = timeit(full, mesh, vp, cp, tft)
    print(f"TOTAL render_opaque:       {t*1000:8.1f} ms  ({1.0/t:.1f} FPS)")


if __name__ == "__main__":
    main()
