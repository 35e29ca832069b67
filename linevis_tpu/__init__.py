"""linevis_tpu — TPU-native line visualization framework.

A from-scratch, headless, deterministic rebuild of the capabilities of
chrismile/LineVis (C++/Vulkan; see /root/reference) designed TPU-first:

- scene model (`LineData` hierarchy) mirrors the behavior of
  reference `src/LineData/LineData.hpp:86` but holds padded JAX arrays;
- tube/ribbon geometry generation is batched XLA (vmapped parallel-transport
  scans) instead of CPU meshing (reference `src/Renderers/Tubes/Tubes.hpp:40`);
- rasterization is a deterministic tile-based Pallas pipeline replacing the
  Vulkan raster + OIT zoo (PPLL/MLAB/MBOIT/WBOIT, reference
  `src/Renderers/OIT/*`);
- ray tracing (tubes + RTAO) is an LBVH + wavefront Pallas design replacing
  the Vulkan RT pipeline (reference `src/Renderers/RayTracing/*`).
"""

__version__ = "0.1.0"

from linevis_tpu.core.trajectories import (  # noqa: F401
    Trajectories,
    pad_trajectories,
    compute_trajectories_aabb,
    normalize_trajectories,
)
